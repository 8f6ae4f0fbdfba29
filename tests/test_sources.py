"""Record-reader sources (CSV/JSON + converter plan)."""

import pytest

from geomesa_nifi_ray.sources import FieldSpec, RecordConverter, read_epoch, read_records


def test_read_csv_with_converter(ray_session, tmp_path):
    p = tmp_path / "example.csv"
    p.write_text("fid,name,age,dtg,lon,lat\n"
                 "23623,Harry,20,2015-05-06,-100.2365,23\n"
                 "26236,Hermione,25,2015-06-07,40.232,-53.2356\n"
                 "3233,Severus,30,2015-10-23,3,-62.23\n")
    conv = RecordConverter(
        [
            FieldSpec("id", "tostring($fid)"),
            FieldSpec("name", "$name"),
            FieldSpec("age", "$age::int", required=True),
            FieldSpec("dtg", "date('yyyy-MM-dd', $dtg)"),
            FieldSpec("lon", "$lon::double"),
            FieldSpec("lat", "$lat::double"),
        ]
    )
    ds = read_records([str(p)], format="csv", converter=conv)
    df = ds.to_pandas().sort_values("age").reset_index(drop=True)  # block order is free
    assert len(df) == 3
    assert df.id.tolist() == ["23623", "26236", "3233"]
    assert df.age.tolist() == [20, 25, 30]
    assert str(df.dtg.iloc[0].date()) == "2015-05-06"


def test_read_json_records(ray_session, tmp_path):
    p = tmp_path / "recs.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    ds = read_records([str(p)], format="json")
    assert ds.count() == 2


def test_unsupported_formats(ray_session):
    # avro and xml are now supported; a missing path errors eagerly
    with pytest.raises(FileNotFoundError):
        read_records(["x"], format="avro")
    with pytest.raises(FileNotFoundError):
        read_records(["x"], format="xml")
    with pytest.raises(ValueError):
        read_records(["x"], format="orc")


def test_read_epoch_columns(ray_session):
    ds = read_epoch("/root/testdata/sf0.001/events.parquet", columns=["event_id", "ts"])
    assert set(ds.schema().names) == {"event_id", "ts"}


def test_read_xml_records(ray_session, tmp_path):
    from geomesa_nifi_ray.sources import FieldSpec, RecordConverter, read_records

    xml = """<?xml version="1.0"?>
<rows>
  <row><event_id>1</event_id><user_id>7</user_id><value>1.5</value></row>
  <row><event_id>2</event_id><user_id>8</user_id></row>
</rows>"""
    p = tmp_path / "a.xml"
    p.write_text(xml)
    conv = RecordConverter([
        FieldSpec("event_id", "$event_id::long"),
        FieldSpec("user_id", "$user_id::long"),
        FieldSpec("value", "$value::double"),
    ])
    df = read_records(str(tmp_path), format="xml", converter=conv).to_pandas()
    df = df.sort_values("event_id").reset_index(drop=True)
    assert list(df["event_id"]) == [1, 2]
    assert df["value"][0] == 1.5 and df["value"].isna()[1]

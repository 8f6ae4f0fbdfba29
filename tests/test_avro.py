"""Pure-Python Avro container codec: round-trip, embedded-schema ingest
through the CDC engine (AvroToPutGeoMesa.scala:84-173 parity), and the
GeoAvro-writer export path (GeoAvroRecordSetWriterFactory parity)."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from geomesa_nifi_ray.avro_io import (
    arrow_to_avro_schema,
    read_avro,
    read_avro_schema,
    write_avro,
)


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array(["u1", "u2", None]),
            "warc_ts": pa.array(
                [pd.Timestamp("2026-01-01"), pd.Timestamp("2026-01-02 03:04:05.000006"), None],
                type=pa.timestamp("us"),
            ),
            "html": pa.array([b"<p>a</p>", None, b""], type=pa.large_binary()),
            "n": pa.array([1, None, -12345678901], type=pa.int64()),
            "score": pa.array([1.5, None, -0.25], type=pa.float64()),
            "ok": pa.array([True, False, None]),
            "links": pa.array([["a", "b"], [], None], type=pa.list_(pa.string())),
            "headers": pa.array(
                [[("k", "v"), ("k2", "v2")], [], None],
                type=pa.map_(pa.string(), pa.string()),
            ),
            "meta": pa.array(
                [{"s": 0.5, "t": [1]}, None, {"s": None, "t": []}],
                type=pa.struct([("s", pa.float64()), ("t", pa.list_(pa.int64()))]),
            ),
        }
    )


def test_avro_roundtrip_all_types(tmp_path):
    t = _sample_table()
    p = str(tmp_path / "t.avro")
    write_avro(t, p)
    back = read_avro(p)
    assert back.num_rows == t.num_rows
    for name in t.column_names:
        want = t[name].to_pylist()
        got = back[name].to_pylist()
        if name == "html":  # large_binary reads back as binary
            assert [bytes(x) if x is not None else None for x in got] == want
        else:
            assert got == want, name


def test_avro_schema_embedded(tmp_path):
    t = _sample_table()
    p = str(tmp_path / "t.avro")
    write_avro(t, p)
    avro_schema, arrow_schema = read_avro_schema(p)
    assert avro_schema["type"] == "record"
    assert [f["name"] for f in avro_schema["fields"]] == t.column_names
    assert arrow_schema.field("n").type == pa.int64()
    assert arrow_schema.field("warc_ts").type == pa.timestamp("us")


def test_avro_deterministic_bytes(tmp_path):
    t = _sample_table()
    p = str(tmp_path / "t.avro")
    write_avro(t, p)
    b1 = open(p, "rb").read()
    write_avro(t, p)
    assert open(p, "rb").read() == b1  # idempotent replay writes same bytes


def test_avro_ingest_through_engine(ray_session, tmp_path):
    """AvroToPutGeoMesa parity: an Avro epoch with embedded schema ingests
    through the same convert -> schema-check -> upsert chain and matches a
    parquet ingest of identical rows."""
    import pyarrow.parquet as pq

    from geomesa_nifi_ray.engine import CDCEngine
    from geomesa_nifi_ray.sources import read_avro_files
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    meta = write_binlog(str(tmp_path / "bl"),
                        BinlogSpec(num_events=400, num_urls=80, num_epochs=1))
    e0 = meta["epochs"][0]
    files = sorted(
        os.path.join(e0["path"], f) for f in os.listdir(e0["path"]) if f.endswith(".parquet")
    )
    avro_dir = str(tmp_path / "avro_epoch")
    os.makedirs(avro_dir)
    for i, f in enumerate(files):
        t = pq.read_table(f)
        write_avro(t, os.path.join(avro_dir, f"part-{i}.avro"))

    eng_a = CDCEngine(str(tmp_path / "lake_avro"), num_buckets=4)
    ds = read_avro_files(avro_dir)
    eng_a.apply_epoch(ds, 0, (e0["offset_min"], e0["offset_max"]))

    eng_p = CDCEngine(str(tmp_path / "lake_parquet"), num_buckets=4)
    eng_p.apply_epoch(e0["path"], 0, (e0["offset_min"], e0["offset_max"]))

    assert eng_a.table.snapshot_table().equals(eng_p.table.snapshot_table())


def test_avro_export_roundtrip(ray_session, tmp_path):
    import ray.data

    from geomesa_nifi_ray.export import export_dataset
    from geomesa_nifi_ray.sources import read_avro_files

    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64()),
                  "b": pa.array(["x", "y", None])})
    out = str(tmp_path / "out")
    lineage = export_dataset(ray.data.from_arrow(t), out, format="avro").to_pandas()
    assert lineage["rows"].sum() == 3
    back = read_avro_files(out.rstrip("/") if False else [p for p in lineage["path"]]).to_pandas()
    assert sorted(back["a"]) == [1, 2, 3]

    with pytest.raises(ValueError):
        export_dataset(ray.data.from_arrow(t), out, format="avro", gzip=True)

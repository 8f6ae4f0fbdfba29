"""Snapshot export formats (ConvertToGeoFile parity)."""

import glob
import gzip
import json
import os

import pyarrow as pa
import pyarrow.ipc as paipc
import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.export import export_dataset


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")


def test_parquet_export(ds, tmp_path):
    out = export_dataset(ds, str(tmp_path / "pq"), "parquet")
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == 500


def test_csv_export_roundtrip(ds, tmp_path):
    lineage = export_dataset(ds, str(tmp_path / "csv"), "csv").to_pandas()
    assert lineage.rows.sum() == 500
    assert all(p.endswith(".csv") for p in lineage.path)


def test_jsonl_gzip_export(ds, tmp_path):
    lineage = export_dataset(ds, str(tmp_path / "jl"), "jsonl", gzip=True).to_pandas()
    assert lineage.rows.sum() == 500
    path = lineage.path.iloc[0]
    assert path.endswith(".jsonl.gz")
    with gzip.open(path, "rt") as f:
        row = json.loads(f.readline())
    assert "doc_id" in row


def test_arrow_ipc_export(ds, tmp_path):
    lineage = export_dataset(ds, str(tmp_path / "ar"), "arrow").to_pandas()
    total = 0
    for p in lineage.path:
        with open(p, "rb") as f:
            total += paipc.open_file(f).read_all().num_rows
    assert total == 500


def test_egress_epoch_to_jsonl(ray_session, tmp_path):
    from geomesa_nifi_ray.engine import CDCEngine
    from geomesa_nifi_ray.export import egress_epoch
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    bl = write_binlog(str(tmp_path / "bl"), BinlogSpec(num_events=800, num_urls=150,
                                                       num_epochs=2, seed=5))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    eng.replay_binlog(bl)
    lineage = egress_epoch(eng.table, 1, str(tmp_path / "out"), format="jsonl",
                           columns=["url", "offset", "lang"]).to_pandas()
    assert lineage.rows.sum() > 0
    with open(lineage.path.iloc[0]) as f:
        row = json.loads(f.readline())
    assert set(row) == {"url", "offset", "lang"}
    lo, hi = bl["epochs"][1]["offset_min"], bl["epochs"][1]["offset_max"]
    assert lo <= row["offset"] <= hi


def test_bucket_file_user_data(ray_session, tmp_path):
    """Parquet schema metadata carries the SFT-user-data analog."""
    from geomesa_nifi_ray.engine import CDCEngine
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    bl = write_binlog(str(tmp_path / "bl2"), BinlogSpec(num_events=300, num_urls=60,
                                                        num_epochs=1, seed=6))
    eng = CDCEngine(str(tmp_path / "lake2"), num_buckets=2)
    eng.replay_binlog(bl)
    f = eng.table.snapshot_files()[0]
    md = pq.read_schema(f).metadata
    assert md[b"lake.key"] == b"url"
    assert md[b"lake.order"] == b"warc_ts,offset"
    assert b"lake.kernel_version" in md


def test_invalid_format(ds, tmp_path):
    with pytest.raises(ValueError):
        export_dataset(ds, str(tmp_path / "x"), "shapefile")
    with pytest.raises(ValueError):
        export_dataset(ds, str(tmp_path / "x"), "parquet", gzip=True)


def test_egress_epoch_avro(ray_session, tmp_path):
    """Change-stream egress to Avro shards (GeoAvro writer parity) reads
    back through the pure-Python codec with the rows intact."""
    from geomesa_nifi_ray.engine import CDCEngine
    from geomesa_nifi_ray.export import egress_epoch
    from geomesa_nifi_ray.sources import read_avro_files
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    bl = write_binlog(str(tmp_path / "bl"),
                      BinlogSpec(num_events=400, num_urls=100, num_epochs=2))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    eng.replay_binlog(bl)
    out = str(tmp_path / "eg")
    lineage = egress_epoch(eng.table, 1, out, format="avro",
                           columns=["url", "warc_ts", "text", "offset"]).to_pandas()
    assert lineage["rows"].sum() > 0
    back = read_avro_files([p for p in lineage["path"]]).to_pandas()
    want = eng.table.epoch_changes_dataset(1).to_pandas()
    assert sorted(back["url"]) == sorted(want["url"])
    assert sorted(back["offset"]) == sorted(want["offset"])


def test_export_is_idempotent(ray_session, tmp_path):
    """Re-running the same export overwrites the same shard files instead of
    accumulating duplicates (resumable-output contract)."""
    import os

    import pyarrow as pa
    import ray.data

    from geomesa_nifi_ray.export import export_dataset

    t = pa.table({"a": list(range(100)), "b": [f"x{i}" for i in range(100)]})
    out = str(tmp_path / "out")
    export_dataset(ray.data.from_arrow(t), out, format="jsonl").to_pandas()
    first = sorted(os.listdir(out))
    export_dataset(ray.data.from_arrow(t), out, format="jsonl").to_pandas()
    assert sorted(os.listdir(out)) == first  # same names, no duplicates


def test_gml_gml2_export(ray_session, tmp_path):
    import ray.data

    from geomesa_nifi_ray.export import export_dataset

    t = pa.table({
        "id": ["f1"], "url": ["https://x/<a>&b"],
        "lon": pa.array([1.5], pa.float64()), "lat": pa.array([2.5], pa.float64()),
    })
    for fmt, needle in [
        ("gml", "<gml:pos>2.5 1.5</gml:pos>"),
        ("gml2", "<gml:coordinates>1.5,2.5</gml:coordinates>"),
    ]:
        out = str(tmp_path / fmt)
        lineage = export_dataset(ray.data.from_arrow(t), out, format=fmt).take_all()
        body = open(lineage[0]["path"]).read()
        assert body.startswith('<?xml version="1.0"')
        assert needle in body
        assert "<url>https://x/&lt;a&gt;&amp;b</url>" in body  # XML escaping
        assert 'fid="f1"' in body


def test_leaflet_export(ray_session, tmp_path):
    import json
    import re

    import ray.data

    from geomesa_nifi_ray.export import export_dataset

    t = pa.table({"id": ["a"], "lon": pa.array([3.0]), "lat": pa.array([4.0])})
    out = str(tmp_path / "lf")
    lineage = export_dataset(ray.data.from_arrow(t), out, format="leaflet").take_all()
    body = open(lineage[0]["path"]).read()
    assert body.startswith("<!DOCTYPE html>")
    assert "L.geoJSON(data)" in body
    fc = json.loads(re.search(r"var data = (\{.*?\});\n", body, re.S).group(1))
    assert fc["features"][0]["geometry"]["coordinates"] == [3.0, 4.0]


def test_bin_export_fixed_records(ray_session, tmp_path):
    import struct
    import zlib

    import ray.data

    from geomesa_nifi_ray.export import export_dataset

    ts = pa.array([1_700_000_000_000_000, 1_700_000_123_000_000],
                  pa.int64()).cast(pa.timestamp("us"))
    t = pa.table({
        "id": ["u1", "u2"], "warc_ts": ts,
        "lat": pa.array([10.0, -5.5], pa.float64()),
        "lon": pa.array([20.0, 30.25], pa.float64()),
    })
    out = str(tmp_path / "bin")
    lineage = export_dataset(ray.data.from_arrow(t), out, format="bin").take_all()
    data = open(lineage[0]["path"], "rb").read()
    assert len(data) == 32  # 2 records x 16 bytes
    r0 = struct.unpack("<iiff", data[:16])
    assert r0[0] == (zlib.crc32(b"u1") & 0x7FFFFFFF)
    assert r0[1] == 1_700_000_000
    assert r0[2] == 10.0 and r0[3] == 20.0


def test_parquet_partitioned_export(ray_session, tmp_path):
    """--partition-by writes a hive-partitioned parquet layout (one
    directory per value) that reads back whole; non-parquet formats
    reject partition_cols."""
    import os

    import pyarrow.dataset as pads
    import ray.data

    from geomesa_nifi_ray.export import export_dataset

    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(10)]),
        "lang": pa.array(["en", "de"] * 5),
        "n": pa.array(range(10), type=pa.int64()),
    })
    out = str(tmp_path / "part")
    export_dataset(ray.data.from_arrow(t), out, format="parquet",
                   partition_cols=["lang"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en"]
    back = pads.dataset(out, partitioning="hive").to_table()
    assert back.num_rows == 10
    assert sorted(back["url"].to_pylist()) == sorted(t["url"].to_pylist())
    with pytest.raises(ValueError, match="parquet-only"):
        export_dataset(ray.data.from_arrow(t), str(tmp_path / "x"),
                       format="jsonl", partition_cols=["lang"])
    with pytest.raises(ValueError, match="unknown partition column"):
        export_dataset(ray.data.from_arrow(t), str(tmp_path / "y"),
                       format="parquet", partition_cols=["lang", " split"])
    # parquet appends on re-run (uuid filenames): refuse non-empty out dir
    with pytest.raises(ValueError, match="non-empty"):
        export_dataset(ray.data.from_arrow(t), out, format="parquet")

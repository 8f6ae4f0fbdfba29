"""Per-row visibility + user-data columns through ingest -> lake -> egress
(SimpleFeatureRecordConverter.scala:79-116 analog, SURVEY §1.1), nested
column types through the lake, and the nested/uuid converter-DSL ops."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.convert import ConvertError, FieldSpec, RecordConverter
from geomesa_nifi_ray.engine import (
    CDCEngine,
    PAGE_SCHEMA_WITH_METADATA,
)


def _epoch_table(rows, off0):
    """rows: (url, ts, body, vis, userdata_dict)"""
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([pd.Timestamp(r[1]) for r in rows], type=pa.timestamp("us")),
            "html": pa.array([f"<p>{r[2]}</p>".encode() for r in rows], type=pa.large_binary()),
            "lang": pa.array(["en"] * len(rows)),
            "offset": pa.array(range(off0, off0 + len(rows)), type=pa.int64()),
            "_vis": pa.array([r[3] for r in rows], type=pa.string()),
            "_userdata": pa.array(
                [None if r[4] is None else json.dumps(r[4], sort_keys=True) for r in rows],
                type=pa.string(),
            ),
        }
    )


def _write_epoch(path, table):
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, "part-0.parquet"))


def test_vis_userdata_roundtrip(ray_session, tmp_path):
    root = str(tmp_path / "bl")
    _write_epoch(f"{root}/epoch-00000", _epoch_table(
        [("u1", "2026-01-01", "a", "admin&user", {"k": 1}),
         ("u2", "2026-01-01", "b", None, None)], 0))
    _write_epoch(f"{root}/epoch-00001", _epoch_table(
        [("u1", "2026-01-02", "a2", "user", {"k": 2}),
         ("u3", "2026-01-02", "c", "admin", {"x": [1, 2]})], 10))

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2,
                    schema=PAGE_SCHEMA_WITH_METADATA)
    eng.apply_epoch(f"{root}/epoch-00000", 0, (0, 1))
    eng.apply_epoch(f"{root}/epoch-00001", 1, (10, 11))

    snap = eng.table.snapshot_table()
    assert "_vis" in snap.column_names and "_userdata" in snap.column_names
    by_url = {
        u: (v, d)
        for u, v, d in zip(snap["url"].to_pylist(), snap["_vis"].to_pylist(),
                           snap["_userdata"].to_pylist())
    }
    assert by_url["u1"] == ("user", '{"k": 2}')        # LWW winner's metadata
    assert by_url["u2"] == (None, None)                # nulls survive
    assert json.loads(by_url["u3"][1]) == {"x": [1, 2]}

    # egress carries the metadata columns too
    eg = eng.table.epoch_changes_dataset(1).to_pandas()
    assert "_vis" in eg.columns
    evis = dict(zip(eg["url"], eg["_vis"]))
    assert evis == {"u1": "user", "u3": "admin"}


def test_vis_userdata_nullfilled_when_absent(ray_session, tmp_path):
    """Inputs without the metadata columns ingest fine (Existing-mode
    null-fill projection)."""
    t = _epoch_table([("u1", "2026-01-01", "a", "x", {"k": 1})], 0)
    t = t.drop_columns(["_vis", "_userdata"])
    _write_epoch(str(tmp_path / "bl" / "epoch-00000"), t)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2,
                    schema=PAGE_SCHEMA_WITH_METADATA)
    eng.apply_epoch(str(tmp_path / "bl" / "epoch-00000"), 0, (0, 0))
    snap = eng.table.snapshot_table()
    assert snap["_vis"].null_count == snap.num_rows


def test_nested_columns_through_lake(ray_session, tmp_path):
    """A lake table with list/map columns round-trips through replay +
    reload (lossless schema codec + generic LWW merge)."""
    schema = pa.schema(
        list(PAGE_SCHEMA_WITH_METADATA)
        + [pa.field("links", pa.list_(pa.string())),
           pa.field("headers", pa.map_(pa.string(), pa.string()))]
    )
    t = _epoch_table([("u1", "2026-01-01", "a", None, None),
                      ("u2", "2026-01-01", "b", None, None)], 0)
    t = t.append_column("links", pa.array([["l1", "l2"], []], type=pa.list_(pa.string())))
    t = t.append_column(
        "headers",
        pa.array([[("ct", "text/html")], []], type=pa.map_(pa.string(), pa.string())),
    )
    _write_epoch(str(tmp_path / "bl" / "epoch-00000"), t)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2, schema=schema)
    eng.apply_epoch(str(tmp_path / "bl" / "epoch-00000"), 0, (0, 1))

    reloaded = CDCEngine(str(tmp_path / "lake"), num_buckets=2)  # re-read _table.json
    assert reloaded.table.schema.field("links").type.equals(pa.list_(pa.string()))
    snap = reloaded.table.snapshot_table()
    got = dict(zip(snap["url"].to_pylist(), snap["links"].to_pylist()))
    assert got == {"u1": ["l1", "l2"], "u2": []}


def test_dsl_nested_and_uuid_ops():
    batch = pa.table(
        {
            "s": pa.array(["a,b,c", "x", ""]),
            "l": pa.array([["p", "q"], [], None], type=pa.list_(pa.string())),
            "m": pa.array([[("k", "v")], [], None], type=pa.map_(pa.string(), pa.string())),
            "st": pa.array(
                [{"a": 1}, {"a": 2}, None], type=pa.struct([("a", pa.int64())])
            ),
            "u": pa.array(
                ["123E4567-E89B-12D3-A456-426614174000", "not-a-uuid", None]
            ),
        }
    )
    conv = RecordConverter(
        [
            FieldSpec("parts_n", "list_len(split($s, ','))"),
            FieldSpec("joined", "join($l, '|')"),
            FieldSpec("first", "list_get($l, 0)"),
            FieldSpec("mk", "map_get($m, 'k')"),
            FieldSpec("sa", "struct_get($st, 'a')"),
            FieldSpec("uu", "uuid($u)"),
        ]
    )
    out = conv(batch)
    assert out["parts_n"].to_pylist() == [3, 1, 1]
    assert out["joined"].to_pylist() == ["p|q", "", None]
    assert out["first"].to_pylist() == ["p", None, None]
    assert out["mk"].to_pylist() == ["v", None, None]
    assert out["sa"].to_pylist() == [1, 2, None]
    assert out["uu"].to_pylist() == [
        "123e4567-e89b-12d3-a456-426614174000", None, None
    ]
    with pytest.raises(ConvertError):
        RecordConverter([FieldSpec("uu", "uuid($u)")], error_mode="raise")(batch)

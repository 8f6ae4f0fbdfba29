"""Round-2 regression tests for the ADVICE.md findings.

- vacuum()/lineage_table() must tolerate the gapped manifest log a
  catch-up batched commit leaves behind (one manifest per epoch *range*);
- schema evolution must reject non-round-trippable column types BEFORE
  _table.json is widened (no permanently-unloadable tables), and the JSON
  schema codec must round-trip dates/timestamps/nested types losslessly;
- merge_update must coalesce per column (null change value keeps the base
  value — UpdateGeoMesaRecord semantics and the repo's own oracle);
- tail(require_marker=True) must ignore epoch dirs until _SUCCESS exists.
"""

import os

import pandas as pd
import pyarrow as pa
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.metrics import lineage_table
from geomesa_nifi_ray.schema import (
    CompatibilityMode,
    SchemaError,
    merge_schemas,
    schema_from_json,
    schema_to_json,
)
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog
from geomesa_nifi_ray.upsert import merge_update


@pytest.fixture()
def catchup_lake(ray_session, tmp_path):
    meta = write_binlog(
        str(tmp_path / "binlog"), BinlogSpec(num_events=600, num_urls=150, num_epochs=3)
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    eng.replay_binlog(meta, catchup=True)
    return eng


def test_vacuum_after_catchup_gapped_log(catchup_lake):
    t = catchup_lake.table
    # catch-up wrote ONE manifest for epochs [0, 2]
    assert t.manifest_epochs() == [2]
    assert t.manifest(2)["epochs_covered"] == [0, 2]
    deleted = t.vacuum(retain_epochs=2)  # must not raise on missing epoch-00001
    assert deleted == []  # single live manifest: everything is retained
    assert t.snapshot_table().num_rows > 0


def test_lineage_table_after_catchup_gapped_log(catchup_lake):
    lt = lineage_table(catchup_lake.table).to_pandas()
    assert set(lt["epoch"]) == {2}
    assert (lt["epoch_first"] == 0).all() and (lt["epoch_last"] == 2).all()
    assert lt["rows"].sum() > 0


def test_schema_json_roundtrip_nested_and_dates():
    s = pa.schema(
        [
            pa.field("d32", pa.date32()),
            pa.field("tns", pa.timestamp("ns")),
            pa.field("ttz", pa.timestamp("ms", tz="America/New_York")),
            pa.field("links", pa.list_(pa.string())),
            pa.field("headers", pa.map_(pa.string(), pa.string())),
            pa.field(
                "meta",
                pa.struct(
                    [pa.field("score", pa.float64()), pa.field("tags", pa.list_(pa.int64()))]
                ),
            ),
        ]
    )
    rt = schema_from_json(schema_to_json(s))
    for f in s:
        assert rt.field(f.name).type.equals(f.type), f.name


def test_update_evolution_rejects_unsupported_type_before_persist():
    stored = pa.schema([pa.field("url", pa.string())])
    incoming = pa.schema(
        [pa.field("url", pa.string()),
         pa.field("bad", pa.dictionary(pa.int32(), pa.string()))]
    )
    with pytest.raises(SchemaError, match="bad"):
        merge_schemas(stored, incoming, CompatibilityMode.UPDATE)


def test_update_evolution_date_column_roundtrips(ray_session, tmp_path):
    """The exact ADVICE repro: ingest adds a date32 column under UPDATE mode;
    the widened _table.json must load back."""
    import pyarrow.parquet as pq

    meta = write_binlog(
        str(tmp_path / "binlog"), BinlogSpec(num_events=200, num_urls=60, num_epochs=2)
    )
    # epoch 1 gains a date32 column
    e1 = meta["epochs"][1]
    files = sorted(
        os.path.join(e1["path"], f) for f in os.listdir(e1["path"]) if f.endswith(".parquet")
    )
    for f in files:
        t = pq.read_table(f)
        t = t.append_column(
            "crawl_date", pa.array([pd.Timestamp("2026-01-01").date()] * t.num_rows,
                                   type=pa.date32())
        )
        pq.write_table(t, f)

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4,
                    compatibility=CompatibilityMode.UPDATE)
    eng.replay_binlog(meta)
    reloaded = CDCEngine(str(tmp_path / "lake"), num_buckets=4)  # re-reads _table.json
    assert reloaded.table.schema.field("crawl_date").type.equals(pa.date32())
    snap = reloaded.table.snapshot_table()
    assert "crawl_date" in snap.column_names


def test_merge_update_null_change_keeps_base_value():
    base = pa.table(
        {
            "url": pa.array(["a", "b"]),
            "warc_ts": pa.array([1, 1], type=pa.int64()).cast(pa.timestamp("us")),
            "offset": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["base-a", "base-b"]),
            "lang": pa.array(["en", "de"]),
        }
    )
    changes = pa.table(
        {
            "url": pa.array(["a"]),
            "warc_ts": pa.array([5], type=pa.int64()).cast(pa.timestamp("us")),
            "offset": pa.array([10], type=pa.int64()),
            "text": pa.array([None], type=pa.string()),  # null must NOT clobber
            "lang": pa.array(["fr"]),
        }
    )
    merged, unmatched = merge_update(base, changes, "url", ["warc_ts", "offset"])
    assert unmatched == 0
    row = {c: merged[c][0].as_py() for c in merged.column_names}
    assert row["text"] == "base-a"  # coalesced: base kept on null change
    assert row["lang"] == "fr"      # non-null change applied
    assert merged["text"][1].as_py() == "base-b"


def test_tail_require_marker(ray_session, tmp_path):
    meta = write_binlog(
        str(tmp_path / "binlog"), BinlogSpec(num_events=300, num_urls=80, num_epochs=2)
    )
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    # no markers yet: nothing discovered, nothing committed
    assert eng.discover_epochs(str(tmp_path / "binlog"), require_marker=True) == []
    res = eng.tail(str(tmp_path / "binlog"), poll_interval=0.01, max_idle_polls=1,
                   require_marker=True)
    assert res == [] and eng.table.committed_epoch() is None
    # publish markers -> both epochs ingest
    for e in meta["epochs"]:
        open(os.path.join(e["path"], "_SUCCESS"), "w").close()
    res = eng.tail(str(tmp_path / "binlog"), poll_interval=0.01, max_idle_polls=1,
                   require_marker=True)
    assert eng.table.committed_epoch() == 1


def test_dynamic_write_mode_per_epoch(ray_session, tmp_path):
    """FeatureWriters.DynamicWriters parity at epoch granularity: an epoch
    descriptor's own mode key wins over the call-level default."""
    meta = write_binlog(
        str(tmp_path / "bl"), BinlogSpec(num_events=600, num_urls=150, num_epochs=3)
    )
    meta["epochs"][1]["mode"] = "update"     # no inserts in epoch 1
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    results = eng.replay_binlog(meta)
    assert [r.manifest["mode"] for r in results] == ["upsert", "update", "upsert"]
    # the update epoch skipped unmatched keys -> counted failed
    assert results[1].rows_failed > 0

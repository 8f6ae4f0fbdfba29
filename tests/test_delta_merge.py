"""Delta-file bucket merge + compaction (the FeatureWriters incremental-
flush efficiency class): steady-state upsert epochs write O(changes) delta
files instead of rewriting touched buckets wholesale; chains compact at
max_deltas; logical table state is identical to full-rewrite mode."""

import os

import pyarrow.parquet as pq
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

SPEC = BinlogSpec(num_events=3000, num_urls=400, num_epochs=6, seed=11)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    return write_binlog(str(tmp_path_factory.mktemp("bl_delta")), SPEC)


def test_delta_chain_grows_then_compacts(ray_session, tmp_path, binlog):
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8, max_deltas=4)
    eng.replay_binlog(binlog)
    # epoch 1..4 append deltas; epoch 5 hits max_deltas on every touched
    # bucket and compacts (chain reset)
    m1 = eng.table.manifest(1)
    assert any(e["deltas"] for e in m1["buckets"].values())
    for e in m1["buckets"].values():
        if e["epoch_file"]:
            assert "delta-" in e["epoch_file"]
    m5 = eng.table.manifest(5)
    for e in m5["buckets"].values():
        if e["epoch_file"]:          # touched this epoch -> compacted
            assert e["deltas"] == [] and "delta-" not in e["file"]


def test_delta_mode_matches_full_rewrite(ray_session, tmp_path, binlog):
    delta_eng = CDCEngine(str(tmp_path / "lk_d"), num_buckets=8, max_deltas=4)
    delta_eng.replay_binlog(binlog)
    full_eng = CDCEngine(str(tmp_path / "lk_f"), num_buckets=8, max_deltas=0)
    full_eng.replay_binlog(binlog)
    assert delta_eng.table.snapshot_table().equals(full_eng.table.snapshot_table())
    # snapshot_dataset (chain-merging read path) agrees with snapshot_table
    ds_rows = delta_eng.table.snapshot_dataset().count()
    assert ds_rows == delta_eng.table.snapshot_table().num_rows


def test_delta_write_volume_is_small(ray_session, tmp_path, binlog):
    """The point of deltas: a steady-state epoch writes ~O(changes) bytes,
    not a full copy of every touched bucket."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8, max_deltas=10)
    eng.replay_binlog(binlog)
    m1 = eng.table.manifest(1)
    delta_rows = base_rows = 0
    for e in m1["buckets"].values():
        base_rows += int(e["rows"])
        if e["epoch_file"]:
            delta_rows += pq.ParquetFile(
                eng.table.abs_path(e["epoch_file"])).metadata.num_rows
    assert 0 < delta_rows < base_rows  # wrote the changes, not the table


def test_delta_crash_resume_identical(ray_session, tmp_path, binlog):
    a = CDCEngine(str(tmp_path / "lk_a"), num_buckets=8)
    a.replay_binlog(binlog)
    b = CDCEngine(str(tmp_path / "lk_b"), num_buckets=8)
    for e in binlog["epochs"]:
        b.apply_epoch(e["path"], e["epoch"], (e["offset_min"], e["offset_max"]))
    # crash: drop the manifest of delta epoch 3 AND of compaction epoch 5
    os.remove(os.path.join(str(tmp_path / "lk_b"), "pages", "_log", "epoch-00005.json"))
    b2 = CDCEngine(str(tmp_path / "lk_b"), num_buckets=8)
    assert b2.table.committed_epoch() == 4
    b2.replay_binlog(binlog)
    assert a.table.snapshot_table().equals(b2.table.snapshot_table())
    assert a.table.manifest(5) == b2.table.manifest(5)


def test_late_event_loses_to_stored_winner(ray_session, tmp_path):
    """A change row with an older warc_ts than the stored winner must NOT
    enter the delta (LWW on (warc_ts, offset), not arrival order)."""
    import pandas as pd
    import pyarrow as pa

    from geomesa_nifi_ray.engine import PAGE_SCHEMA

    def mk_epoch(path, rows, off0):
        t = pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "warc_ts": pa.array([pd.Timestamp(r[1]) for r in rows],
                                    type=pa.timestamp("us")),
                "html": pa.array([f"<p>{r[2]}</p>".encode() for r in rows],
                                 type=pa.large_binary()),
                "text": pa.array([None] * len(rows), type=pa.large_string()),
                "lang": pa.array(["en"] * len(rows)),
                "offset": pa.array(range(off0, off0 + len(rows)), type=pa.int64()),
            }
        )
        os.makedirs(path, exist_ok=True)
        pq.write_table(t, os.path.join(path, "part-0.parquet"))
        return {"epoch": None, "path": path}

    root = str(tmp_path / "bl")
    mk_epoch(f"{root}/epoch-00000", [("u1", "2026-01-02", "new"), ("u2", "2026-01-01", "x")], 0)
    mk_epoch(f"{root}/epoch-00001", [("u1", "2026-01-01", "stale"), ("u2", "2026-01-03", "y")], 10)

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    eng.apply_epoch(f"{root}/epoch-00000", 0, (0, 1))
    eng.apply_epoch(f"{root}/epoch-00001", 1, (10, 11))
    snap = eng.table.snapshot_table()
    by_url = {u: t for u, t in zip(snap["url"].to_pylist(), snap["text"].to_pylist())}
    assert by_url["u1"] == "new"    # late event (older ts) lost
    assert by_url["u2"] == "y"      # newer ts won


def test_late_exchange_matches_sort_exchange(ray_session, tmp_path, binlog):
    """The late-materialized keyed exchange (keys shuffle + winner payload
    fetch) must produce the byte-identical lake as the Dataset sort
    exchange — snapshots AND manifests."""
    late = CDCEngine(str(tmp_path / "lk_late"), num_buckets=8)
    late.replay_binlog(binlog, exchange="late")
    sort = CDCEngine(str(tmp_path / "lk_sort"), num_buckets=8)
    sort.replay_binlog(binlog, exchange="sort")
    assert late.table.snapshot_table().equals(sort.table.snapshot_table())
    for e in range(6):
        ml, ms = late.table.manifest(e), sort.table.manifest(e)
        assert ml["buckets"] == ms["buckets"], e
        assert (ml["rows_failed"], ml["rows_in"]) == (ms["rows_failed"], ms["rows_in"])


def test_late_exchange_catchup_and_resume(ray_session, tmp_path, binlog):
    eng = CDCEngine(str(tmp_path / "lk_lc"), num_buckets=8)
    eng.replay_binlog(binlog, catchup=True, exchange="late")
    ref = CDCEngine(str(tmp_path / "lk_ref"), num_buckets=8)
    ref.replay_binlog(binlog)
    assert eng.table.snapshot_table().equals(ref.table.snapshot_table())
    # crash/resume on the late path
    os.remove(os.path.join(str(tmp_path / "lk_lc"), "pages", "_log", "epoch-00005.json"))
    eng2 = CDCEngine(str(tmp_path / "lk_lc"), num_buckets=8)
    eng2.replay_binlog(binlog, catchup=True, exchange="late")
    assert eng2.table.snapshot_table().equals(ref.table.snapshot_table())


def test_delta_snapshot_dataset_column_pruned(ray_session, tmp_path, binlog):
    """Column-pruned snapshot reads work over delta chains (the merge pulls
    in key+order internally, output carries only the asked columns)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8, max_deltas=10)
    eng.replay_binlog(binlog)
    assert any(e.get("deltas") for e in eng.table.live_entries().values())
    df = eng.table.snapshot_dataset(columns=["url", "lang"]).to_pandas()
    full = eng.table.snapshot_table()
    assert sorted(df.columns) == ["lang", "url"]
    assert len(df) == full.num_rows
    assert sorted(df["url"]) == sorted(full["url"].to_pylist())


def test_split_exchange_matches_sort_exchange(ray_session, tmp_path, binlog):
    """The two-wave split exchange (and its single-node one-wave collapse)
    must produce the byte-identical lake as the sort exchange."""
    split = CDCEngine(str(tmp_path / "lk_split"), num_buckets=8)
    split.replay_binlog(binlog, exchange="split")
    sort = CDCEngine(str(tmp_path / "lk_sort2"), num_buckets=8)
    sort.replay_binlog(binlog, exchange="sort")
    assert split.table.snapshot_table().equals(sort.table.snapshot_table())
    for e in range(6):
        ms_, mo = split.table.manifest(e), sort.table.manifest(e)
        assert ms_["buckets"] == mo["buckets"], e
        assert (ms_["rows_failed"], ms_["rows_in"]) == (mo["rows_failed"], mo["rows_in"])

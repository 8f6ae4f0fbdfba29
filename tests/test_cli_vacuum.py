"""CLI surface (python -m geomesa_nifi_ray) + vacuum + multi-table lake."""

import json
import os

import pytest

from geomesa_nifi_ray.engine import CDCEngine, PAGE_SCHEMA
from geomesa_nifi_ray.lake import LakeTable
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog


from conftest import run_cli_json as _run_cli  # noqa: E402


def test_cli_synth_replay_status_egress_vacuum(tmp_path):
    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")

    # 6 epochs cross the max_deltas=4 compaction threshold: epoch 5 rewrites
    # touched buckets, orphaning their old base+delta chains for vacuum
    r = _run_cli("synth", "--out", binlog, "--events", "1500", "--urls", "300",
                 "--epochs", "6")
    assert r["total_rows"] == 1500 and r["epochs"] == 6

    r = _run_cli("replay", "--binlog", binlog, "--lake", lake, "--buckets", "8")
    assert r["committed_epoch"] == 5 and r["rows_in"] == 1500

    r = _run_cli("status", "--lake", lake)
    assert r["committed_epoch"] == 5 and r["table_rows"] > 0
    assert 0 < r["hottest_bucket_share"] < 1

    # keyed view CLI: group count comes from a distributed count (no
    # O(total groups) driver snapshot without --show)
    r = _run_cli("view", "--lake", lake, "--group", "lang",
                 "--state", "keyed", "--distributed")
    assert r["epochs_applied"] == 6 and r["groups"] > 0
    rj = _run_cli("view", "--lake", lake, "--group", "lang", "--show")
    assert r["groups"] == len(rj["counts"]) == rj["groups"]

    r = _run_cli("egress", "--lake", lake, "--epoch", "1", "--out",
                 str(tmp_path / "eg"), "--format", "jsonl")
    assert r["rows"] > 0

    r = _run_cli("vacuum", "--lake", lake, "--retain", "1")
    assert r["deleted_files"] > 0

    # post-vacuum snapshot still reads fine (retained manifests intact)
    r = _run_cli("snapshot", "--lake", lake, "--out", str(tmp_path / "snap"),
                 "--format", "parquet")


def test_vacuum_keeps_carried_files(ray_session, tmp_path):
    bl = write_binlog(str(tmp_path / "bl"),
                      BinlogSpec(num_events=900, num_urls=150, num_epochs=3, seed=9))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8)
    eng.replay_binlog(bl)
    before = eng.table.snapshot_table()
    deleted = eng.table.vacuum(retain_epochs=1)
    # only unreferenced older epoch files go; snapshot is unchanged
    after = eng.table.snapshot_table()
    assert after.equals(before)
    live = {e["file"] for e in eng.table.live_entries().values()}
    assert not (set(deleted) & live)


def test_multi_table_lake(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    a = LakeTable.create(root, "pages", PAGE_SCHEMA, 4)
    b = LakeTable.create(root, "pages_staging", PAGE_SCHEMA, 8)
    assert a.num_buckets == 4 and b.num_buckets == 8
    assert LakeTable.exists(root, "pages") and LakeTable.exists(root, "pages_staging")
    with pytest.raises(FileExistsError):
        LakeTable.create(root, "pages", PAGE_SCHEMA, 4)


def test_cli_compact_folds_chains(tmp_path):
    binlog = str(tmp_path / "bl")
    lake = str(tmp_path / "lake")
    _run_cli("synth", "--out", binlog, "--events", "900", "--urls", "200", "--epochs", "3")
    _run_cli("replay", "--binlog", binlog, "--lake", lake, "--buckets", "4")
    t = LakeTable.load(lake, "pages")
    assert any(e.get("deltas") for e in t.live_entries().values())  # chains exist
    before = t.snapshot_table()
    r = _run_cli("compact", "--lake", lake, "--buckets", "4")
    assert r["buckets_compacted"] > 0
    t2 = LakeTable.load(lake, "pages")
    assert all(not e.get("deltas") for e in t2.live_entries().values())
    assert t2.snapshot_table().equals(before)  # logical state unchanged
    d = _run_cli("vacuum", "--lake", lake, "--retain", "1")
    assert d["deleted_files"] > 0  # old chains reclaimed


def test_cli_diff(tmp_path):
    """`diff --from a --to b` exports the row-level epoch diff with the
    _change tag; diffing an epoch against itself exports nothing."""
    import glob

    binlog = str(tmp_path / "binlog")
    lake = str(tmp_path / "lake")
    _run_cli("synth", "--out", binlog, "--events", "1200", "--urls", "240",
             "--epochs", "3")
    _run_cli("replay", "--binlog", binlog, "--lake", lake, "--buckets", "8")

    out = str(tmp_path / "diff")
    r = _run_cli("diff", "--lake", lake, "--from", "0", "--to", "2",
                 "--out", out, "--format", "jsonl")
    assert r["rows"] > 0 and r["shards"] > 0
    lines = []
    for p in glob.glob(os.path.join(out, "*.jsonl")):
        lines += open(p).read().splitlines()
    assert len(lines) == r["rows"]
    tags = {json.loads(ln)["_change"] for ln in lines}
    assert tags <= {"added", "changed", "removed"} and "added" in tags

    r = _run_cli("diff", "--lake", lake, "--from", "2", "--to", "2",
                 "--out", str(tmp_path / "diff2"), "--format", "jsonl")
    assert r["rows"] == 0


def test_vacuum_stamps_time_travel_floor(ray_session, tmp_path):
    """A vacuum that actually deletes files stamps a monotonic
    time-travel floor; reads below it fail with a clear error instead of
    a bare FileNotFoundError from a deleted chain file, and reads at or
    above it keep working. A no-op vacuum stamps nothing."""
    bl = write_binlog(str(tmp_path / "bl"),
                      BinlogSpec(num_events=900, num_urls=150,
                                 num_epochs=3, seed=9))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    eng.replay_binlog(bl, catchup=False)
    # delta chains keep every epoch referenced: vacuum deletes nothing,
    # no floor, old-epoch time travel still works
    assert eng.table.vacuum(retain_epochs=1) == []
    assert eng.table.meta.get("time_travel_floor") is None
    assert eng.table.snapshot_table(epoch=0).num_rows > 0

    # an orphan shard JSON (crashed sharded commit) vacuums away, but a
    # shard-only deletion must NOT stamp a floor — no manifest references
    # it, so no committed epoch's read is invalidated
    orphan = os.path.join(str(tmp_path / "lake"), "pages", "_log",
                          "shards-00000-deadbeef.json")
    with open(orphan, "w") as f:
        f.write("{}")
    assert eng.table.vacuum(retain_epochs=1) == [
        os.path.join("_log", "shards-00000-deadbeef.json")]
    assert eng.table.meta.get("time_travel_floor") is None
    assert eng.table.snapshot_table(epoch=0).num_rows > 0

    # a second long-lived handle caches its meta BEFORE the vacuum below;
    # the explicit-epoch refresh must still surface the new floor
    stale = LakeTable.load(str(tmp_path / "lake"), "pages")
    assert stale.meta.get("time_travel_floor") is None

    # identity rewrite folds chains; vacuum now deletes the old files
    r = eng.rewrite_epoch(lambda t: t)
    assert eng.table.vacuum(retain_epochs=1)
    floor = eng.table.meta.get("time_travel_floor")
    assert floor == r.epoch

    # below the floor: snapshot, lookup and change-stream reads refuse
    with pytest.raises(ValueError, match="time-travel floor"):
        eng.table.snapshot_table(epoch=0)
    with pytest.raises(ValueError, match="time-travel floor"):
        eng.table.lookup_keys(["anything"], columns=["url"], epoch=1)
    with pytest.raises(ValueError, match="time-travel floor"):
        eng.table.epoch_changes_dataset(1)

    # at the floor: reads work (retained chain is intact)
    assert eng.table.snapshot_table(epoch=r.epoch).num_rows > 0

    # the pre-vacuum handle's cached meta has no floor, but the
    # explicit-epoch check re-reads _table.json and refuses cleanly
    with pytest.raises(ValueError, match="time-travel floor"):
        stale.snapshot_table(epoch=0)

    # floor persists across a reload and never moves backwards
    t2 = LakeTable.load(str(tmp_path / "lake"), "pages")
    assert t2.meta.get("time_travel_floor") == floor
    t2.vacuum(retain_epochs=10_000)  # keeps everything -> no regression
    assert t2.meta.get("time_travel_floor") == floor

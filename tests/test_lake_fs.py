"""LakeFS: the lake over pyarrow.fs backends (FileSystemDataStoreService
analog). The full replay + crash/resume protocol must hold on (a) an
explicitly-passed LocalFileSystem and (b) a mocked object-store-style
filesystem with per-call latency and NO rename support — the S3 model,
where the publish primitive is a single atomic PUT and the manifest
written last remains the linearization point."""

import glob
import os

import pyarrow.fs as pafs
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.lake import LakeFS, LakeTable
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog
from geomesa_nifi_ray.testing import object_store_sim_fs as _object_store_fs

SPEC = BinlogSpec(num_events=1500, num_urls=300, num_epochs=3, seed=55)


@pytest.fixture()
def binlog(tmp_path):
    return write_binlog(str(tmp_path / "binlog"), SPEC)


def test_explicit_local_fs_replay(ray_session, tmp_path, binlog):
    fs = LakeFS(pafs.LocalFileSystem())
    eng = CDCEngine(str(tmp_path / "lake_fs"), num_buckets=8, lake_fs=fs)
    eng.replay_binlog(binlog)
    ref = CDCEngine(str(tmp_path / "lake_ref"), num_buckets=8)
    ref.replay_binlog(binlog)
    assert eng.table.snapshot_table().equals(ref.table.snapshot_table())


def test_no_rename_fs_full_replay_and_snapshot(ray_session, tmp_path, binlog):
    lake = str(tmp_path / "lake_s3")
    eng = CDCEngine(lake, num_buckets=8, lake_fs=_object_store_fs())
    eng.replay_binlog(binlog)
    assert eng.table.committed_epoch() == 2

    ref = CDCEngine(str(tmp_path / "lake_ref"), num_buckets=8)
    ref.replay_binlog(binlog)
    assert eng.table.snapshot_table().equals(ref.table.snapshot_table())
    # distributed snapshot reads go through the same filesystem
    ds = eng.snapshot()
    assert ds.count() == ref.table.snapshot_table().num_rows
    # the no-rename publish never leaves tmp droppings
    assert not [p for p in glob.glob(os.path.join(lake, "**", "*"), recursive=True)
                if ".tmp." in p]


def test_no_rename_fs_crash_resume(ray_session, tmp_path, binlog):
    """Kill the last manifest (the S3 'object never appeared' crash), then
    resume: bit-identical lake, exactly-once."""
    lake = str(tmp_path / "lake_s3b")
    eng = CDCEngine(lake, num_buckets=8, lake_fs=_object_store_fs())
    eng.replay_binlog(binlog)
    want = eng.table.snapshot_table()

    logs = sorted(glob.glob(os.path.join(lake, "pages", "_log", "epoch-*.json")))
    os.remove(logs[-1])
    eng2 = CDCEngine(lake, num_buckets=8, lake_fs=_object_store_fs())
    assert eng2.table.committed_epoch() == 1
    eng2.replay_binlog(binlog)
    assert eng2.table.snapshot_table().equals(want)


def test_no_rename_fs_sequential_and_egress(ray_session, tmp_path, binlog):
    """The per-epoch (delta/tombstone) path and CDC egress also run over
    the object-store filesystem."""
    lake = str(tmp_path / "lake_s3c")
    eng = CDCEngine(lake, num_buckets=8, lake_fs=_object_store_fs())
    eng.replay_binlog(binlog, catchup=False)
    ref = CDCEngine(str(tmp_path / "lake_refc"), num_buckets=8)
    ref.replay_binlog(binlog, catchup=False)
    assert eng.table.snapshot_table().equals(ref.table.snapshot_table())
    a = eng.table.epoch_changes_dataset(2).take_all()
    b = ref.table.epoch_changes_dataset(2).take_all()
    key = lambda r: (r["url"], r["offset"])
    assert sorted(a, key=key) == sorted(b, key=key)


def test_vacuum_over_object_store(ray_session, tmp_path, binlog):
    lake = str(tmp_path / "lake_s3v")
    # max_deltas=1 forces a compaction chain reset, leaving epoch-0 files
    # unreferenced by the final manifest
    eng = CDCEngine(lake, num_buckets=8, max_deltas=1,
                    lake_fs=_object_store_fs())
    eng.replay_binlog(binlog, catchup=False)
    want = eng.table.snapshot_table()
    deleted = eng.table.vacuum(retain_epochs=1)
    assert deleted  # pre-compaction chain files are gone
    assert eng.table.snapshot_table().equals(want)


def test_lakefs_rename_default_detection():
    assert LakeFS().rename_capable is True
    assert LakeFS(pafs.LocalFileSystem()).rename_capable is True
    assert _object_store_fs().rename_capable is False


def test_table_handle_carries_fs(tmp_path):
    """A reloaded handle keeps using the explicit filesystem."""
    import pyarrow as pa

    fs = _object_store_fs()
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("offset", pa.int64())])
    LakeTable.create(str(tmp_path), "t1", schema, 4, fs=fs)
    t = LakeTable.load(str(tmp_path), "t1", fs=fs)
    assert t.fs is fs and t.num_buckets == 4
    assert LakeTable.exists(str(tmp_path), "t1", fs=fs)

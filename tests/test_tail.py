"""Live binlog tail: epochs arriving while the tailer polls."""

import os
import shutil
import threading
import time

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

SPEC = BinlogSpec(num_events=1200, num_urls=240, num_epochs=3, seed=33)


def _staged_binlog(tmp_path):
    """Full binlog written to a staging dir; epochs moved into the live dir
    one at a time to simulate arrival."""
    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    os.makedirs(live, exist_ok=True)
    meta = write_binlog(staging, SPEC)
    return meta, staging, live


def _publish(meta, staging, live, epoch):
    src = meta["epochs"][epoch]["path"]
    dst = os.path.join(live, os.path.basename(src))
    shutil.copytree(src, dst + ".tmp")
    os.replace(dst + ".tmp", dst)  # atomic dir appearance


def test_tail_picks_up_arriving_epochs(ray_session, tmp_path):
    meta, staging, live = _staged_binlog(tmp_path)
    _publish(meta, staging, live, 0)

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8)

    def producer():
        time.sleep(0.8)
        _publish(meta, staging, live, 1)
        time.sleep(0.8)
        _publish(meta, staging, live, 2)

    t = threading.Thread(target=producer)
    t.start()
    results = eng.tail(live, poll_interval=0.4, max_idle_polls=5)
    t.join()

    assert eng.table.committed_epoch() == 2
    applied = [r.epoch for r in results]
    assert applied[-1] == 2 and applied[0] == 0

    # tailed state must equal a one-shot replay of the same binlog
    ref = CDCEngine(str(tmp_path / "lake_ref"), num_buckets=8)
    ref.replay_binlog(meta)
    assert ref.table.snapshot_table().equals(eng.table.snapshot_table())
    # offset ranges discovered from parquet stats match the descriptor
    m1 = eng.table.manifest(eng.table.committed_epoch())
    assert m1["offset_max"] == meta["epochs"][2]["offset_max"]


def test_tail_idle_stop(ray_session, tmp_path):
    meta, staging, live = _staged_binlog(tmp_path)
    _publish(meta, staging, live, 0)
    eng = CDCEngine(str(tmp_path / "lake2"), num_buckets=8)
    t0 = time.time()
    results = eng.tail(live, poll_interval=0.2, max_idle_polls=2)
    assert [r.epoch for r in results] == [0]
    assert time.time() - t0 < 30
    # nothing new -> immediate idle exit, no re-apply
    assert eng.tail(live, poll_interval=0.1, max_idle_polls=1) == []


def test_tail_applies_delete_epoch(ray_session, tmp_path):
    """End-to-end GeoMessage loop through the live tailer: an arriving
    epoch dir containing payload-less delete events removes keys."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta, staging, live = _staged_binlog(tmp_path)
    _publish(meta, staging, live, 0)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    eng.tail(live, poll_interval=0.05, max_idle_polls=2)
    snap0 = eng.table.snapshot_table()
    victims = snap0["url"].to_pylist()[:5]

    # publish a hand-built delete epoch dir (next epoch number)
    nxt = eng.table.committed_epoch() + 1
    lo = int(meta["epochs"][0]["offset_max"]) + 1_000
    newer = int(pa.compute.max(snap0["warc_ts"].cast(pa.int64())).as_py()) + 1_000_000
    dels = pa.table({
        "url": pa.array(victims),
        "warc_ts": pa.array([newer + i for i in range(5)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([None] * 5, pa.large_binary()),
        "lang": pa.array([None] * 5, pa.string()),
        "offset": pa.array([lo + i for i in range(5)], pa.int64()),
        "_op": pa.array(["delete"] * 5),
    })
    edir = os.path.join(live, f"epoch-{nxt:05d}")
    os.makedirs(edir + ".tmp")
    pq.write_table(dels, os.path.join(edir + ".tmp", "part-00000.parquet"))
    os.replace(edir + ".tmp", edir)

    res = eng.tail(live, poll_interval=0.05, max_idle_polls=2)
    assert sum(r.rows_deleted for r in res) == 5
    urls = set(eng.table.snapshot_table()["url"].to_pylist())
    assert not urls & set(victims)
    assert len(urls) == snap0.num_rows - 5

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

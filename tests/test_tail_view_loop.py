"""End-to-end CDC-on-CDC loop: a producer publishes binlog epochs, the
tailer ingests them into the source lake, and a downstream consumer keeps
the keyed materialized view fresh after every commit — the full
``GetGeoMesaKafkaRecord -> downstream PutGeoMesa`` pattern the reference's
egress exists for, exercised LIVE (not replayed after the fact)."""

import os
import shutil
import threading
import time

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

SPEC = BinlogSpec(num_events=1500, num_urls=300, num_epochs=3, seed=77)


def _staged(tmp_path):
    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    os.makedirs(live, exist_ok=True)
    meta = write_binlog(staging, SPEC)
    return meta, staging, live


def _publish(meta, staging, live, epoch):
    src = meta["epochs"][epoch]["path"]
    dst = os.path.join(live, os.path.basename(src))
    shutil.copytree(src, dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def test_tail_drives_keyed_view_live(ray_session, tmp_path):
    from geomesa_nifi_ray.derived import GroupCountView, KeyedGroupCountView

    meta, staging, live = _staged(tmp_path)
    _publish(meta, staging, live, 0)

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=8)
    view = KeyedGroupCountView(eng.table, str(tmp_path / "view"),
                               group_col="lang", num_buckets=4)

    refresh_counts = []

    def producer():
        time.sleep(0.8)
        _publish(meta, staging, live, 1)
        time.sleep(0.8)
        _publish(meta, staging, live, 2)

    t = threading.Thread(target=producer)
    t.start()
    # consumer loop: tail one poll cycle at a time, refreshing the view
    # after every batch of commits (the downstream-consumer cadence)
    deadline = time.time() + 60
    while eng.table.committed_epoch() != 2 and time.time() < deadline:
        eng.tail(live, poll_interval=0.3, max_idle_polls=1)
        refresh_counts.append(view.refresh())
        # mid-stream invariant: the view matches the lake RIGHT NOW
        snap = eng.table.snapshot_table()
        live_counts = {}
        for v in snap["lang"].to_pylist():
            if v is not None:
                live_counts[v] = live_counts.get(v, 0) + 1
        assert view.counts() == live_counts
    t.join()
    view.refresh()

    assert eng.table.committed_epoch() == 2
    assert view.last_epoch() == 2

    # final state: keyed view == JSON view == full recompute
    jview = GroupCountView(eng.table, str(tmp_path / "jview"),
                           group_col="lang")
    jview.rebuild()
    assert view.counts() == jview.counts()
    assert sum(refresh_counts) >= 1

"""10^5-group evidence for KeyedGroupCountView (VERDICT r3 item #10).

Synthesizes a CDC source with 100k distinct group values over several
epochs (bulk load, migration update wave, delete wave), maintains the
keyed lake-table view incrementally, and checks incremental == full
recompute after every epoch. Prints per-epoch refresh wall time vs a
from-scratch rebuild, demonstrating the O(changed)-vs-O(state) gap the
keyed state exists for.

Run: python tools/keyed_view_scale.py  (owns its Ray session)
"""

import collections
import json
import shutil
import sys
import tempfile
import time

import pyarrow as pa

sys.path.insert(0, ".")

GROUPS = 100_000
ROWS = 400_000


def _counts_of(snap):
    return {k: v for k, v in
            collections.Counter(snap["lang"].to_pylist()).items()
            if k is not None}


def main():
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    from geomesa_nifi_ray.derived import KeyedGroupCountView
    from geomesa_nifi_ray.engine import CDCEngine

    root = tempfile.mkdtemp(prefix="keyed_view_scale_")
    eng = CDCEngine(root + "/lake", num_buckets=32)
    view = KeyedGroupCountView(eng.table, root + "/view",
                               group_col="lang", num_buckets=32)

    def epoch(e, urls, langs, ts0, off0, ops=None):
        n = len(urls)
        t = {
            "url": pa.array(urls),
            "warc_ts": pa.array([ts0 + i for i in range(n)],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(
                [None if (ops and ops[i] == "delete") else b"<p>x</p>"
                 for i in range(n)], pa.large_binary()),
            "lang": pa.array(langs, pa.string()),
            "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
        }
        if ops:
            t["_op"] = pa.array(ops, pa.string())
        eng.apply_epoch(ray.data.from_arrow(pa.table(t)), epoch=e,
                        offset_range=(off0, off0 + n - 1))

    report = {"groups": GROUPS, "rows": ROWS, "epochs": []}

    # epoch 0: bulk load — every group gets ROWS/GROUPS keys
    urls = [f"https://kv/{i}" for i in range(ROWS)]
    langs = [f"g{i % GROUPS:06d}" for i in range(ROWS)]
    epoch(0, urls, langs, 1_000_000, 0)
    t0 = time.perf_counter()
    view.refresh()
    bulk_s = time.perf_counter() - t0
    assert view.counts() == _counts_of(eng.table.snapshot_table()), "epoch 0"
    report["epochs"].append({"epoch": 0, "kind": "bulk", "rows": ROWS,
                             "refresh_s": round(bulk_s, 2)})

    # epoch 1: 2% of keys migrate to new groups (steady-state update wave)
    m = ROWS // 50
    epoch(1, [f"https://kv/{i}" for i in range(m)],
          [f"h{i % (GROUPS // 10):06d}" for i in range(m)], 2_000_000, ROWS)
    t0 = time.perf_counter()
    view.refresh()
    upd_s = time.perf_counter() - t0
    assert view.counts() == _counts_of(eng.table.snapshot_table()), "epoch 1"
    report["epochs"].append({"epoch": 1, "kind": "update", "rows": m,
                             "refresh_s": round(upd_s, 2)})

    # epoch 2: delete 1% of keys (some groups hit zero -> tombstones)
    d = ROWS // 100
    epoch(2, [f"https://kv/{i}" for i in range(m, m + d)], [None] * d,
          3_000_000, ROWS + m, ops=["delete"] * d)
    t0 = time.perf_counter()
    view.refresh()
    del_s = time.perf_counter() - t0
    assert view.counts() == _counts_of(eng.table.snapshot_table()), "epoch 2"
    report["epochs"].append({"epoch": 2, "kind": "delete", "rows": d,
                             "refresh_s": round(del_s, 2)})

    # from-scratch rebuild for the O(state) comparison
    fresh = KeyedGroupCountView(eng.table, root + "/view2",
                                group_col="lang", num_buckets=32)
    t0 = time.perf_counter()
    fresh.rebuild()
    rb_s = time.perf_counter() - t0
    assert fresh.counts() == view.counts(), "rebuild == incremental"
    report["rebuild_s"] = round(rb_s, 2)

    # distributed refresh (no driver delta dict): replay the same history
    # into a third view and check state identity + timing
    dview = KeyedGroupCountView(eng.table, root + "/view3",
                                group_col="lang", num_buckets=32)
    t0 = time.perf_counter()
    dview.refresh(distributed=True)
    report["distributed_replay_s"] = round(time.perf_counter() - t0, 2)
    assert dview.counts() == view.counts(), "distributed == driver path"
    report["view_groups"] = len(view.counts())
    report["ok"] = True
    print(json.dumps(report))
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Measure the delta-merge row-group key-skip (round-4 verdict item #3).

Two identical lakes (P=4, 2M-row base), one with the default 65536-row
row groups (pruned chain reads) and one written as a single giant row
group per bucket (nothing can be skipped). Then 10 small steady-state
epochs (200 keys each, narrow key ranges — the hot-prefix locality the
skip exploits) are applied to each and the per-epoch apply wall is
compared, along with the skip ratio the engine reports.

Run: python tools/rowgroup_skip_bench.py [num_cpus]
"""

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_events(urls, ts0, off0):
    n = len(urls)
    return pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([f"<p>{u}@{ts0}</p>".encode() for u in urls],
                         pa.large_binary()),
        "lang": pa.array(["en"] * n, pa.string()),
        "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
    })


def run(root, row_group_rows, base_rows, n_epochs, epoch_keys):
    import ray.data

    from geomesa_nifi_ray.engine import CDCEngine

    eng = CDCEngine(root, num_buckets=4, row_group_rows=row_group_rows)
    urls = [f"https://host-{i % 997:03d}.test/p/{i:07d}"
            for i in range(base_rows)]
    eng.apply_epoch(ray.data.from_arrow(make_events(urls, 1_000_000, 0)),
                    epoch=0, offset_range=(0, base_rows - 1))
    walls, rg_tot, rg_skip = [], 0, 0
    for e in range(1, n_epochs + 1):
        # narrow range: one host prefix's pages update together
        lo = (e * 37) % (base_rows - epoch_keys)
        sub = urls[lo:lo + epoch_keys]
        ev = make_events(sub, 1_000_000 + e * 1000, base_rows + e * epoch_keys)
        t0 = time.perf_counter()
        r = eng.apply_epoch(ray.data.from_arrow(ev), epoch=e,
                            offset_range=(base_rows + e * epoch_keys,
                                          base_rows + (e + 1) * epoch_keys - 1))
        walls.append(time.perf_counter() - t0)
        rg_tot += r.row_groups_total
        rg_skip += r.row_groups_skipped
    snap_digest = {b: ent["digest"] for b, ent in
                   eng.table.manifest(n_epochs)["buckets"].items()}
    return walls, rg_tot, rg_skip, snap_digest


def main():
    import ray

    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    base_rows, n_epochs, epoch_keys = 2_000_000, 10, 200
    out = {}
    for name, rg in [("pruned_64k", 65536), ("control_1rg", 1 << 30)]:
        d = tempfile.mkdtemp(prefix=f"rgskip_{name}_")
        try:
            walls, tot, skip, dig = run(d, rg, base_rows, n_epochs, epoch_keys)
            out[name] = {
                "epoch_walls_sec": [round(w, 3) for w in walls],
                "mean_small_epoch_sec": round(sum(walls) / len(walls), 3),
                "row_groups_total": tot,
                "row_groups_skipped": skip,
                "digests": dig,
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    assert out["pruned_64k"]["digests"] == out["control_1rg"]["digests"], \
        "pruning changed observable state!"
    for v in out.values():
        v.pop("digests")
    out["digests_identical"] = True
    out["speedup"] = round(out["control_1rg"]["mean_small_epoch_sec"]
                           / out["pruned_64k"]["mean_small_epoch_sec"], 2)
    print(json.dumps(out, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()

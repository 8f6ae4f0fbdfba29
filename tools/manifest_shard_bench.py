"""10^5-bucket manifest commit measurement (round-4 verdict item #6).

Synthesizes a manifest with 100k bucket entries (the shape of a 100 TB
lake's catch-up epoch at P=10^5) and measures commit_epoch (sharded:
10 range files + 1 main JSON) and the manifest() reassembly read-back,
against the same commit forced single-JSON.

Run: python tools/manifest_shard_bench.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

import geomesa_nifi_ray.lake as lake_mod  # noqa: E402
from geomesa_nifi_ray.lake import LakeTable  # noqa: E402

P = 100_000


def synth_manifest(epoch: int) -> dict:
    return {
        "epoch": epoch,
        "epochs_covered": [epoch, epoch],
        "table": "pages",
        "offset_min": 0,
        "offset_max": 10_000_000,
        "rows_in": 10_000_000,
        "rows_applied": 9_000_000,
        "rows_failed": 0,
        "rows_deleted": 0,
        "rows_collapsed": 1_000_000,
        "mode": "upsert",
        "schema_version": 0,
        "schema_fingerprint": "deadbeef",
        "kernel_version": "v1",
        "buckets": {
            str(b): {
                "file": f"data/bucket={b:05d}/epoch-{epoch:05d}.parquet",
                "deltas": [],
                "epoch_file": f"data/bucket={b:05d}/epoch-{epoch:05d}.parquet",
                "rows": 90 + (b % 37),
                "rows_changed": 10 + (b % 7),
                "digest": f"{b:032x}",
            }
            for b in range(P)
        },
    }


def bench(label, threshold):
    d = tempfile.mkdtemp(prefix=f"shardbench_{label}_")
    old = lake_mod.MANIFEST_SHARD_THRESHOLD
    lake_mod.MANIFEST_SHARD_THRESHOLD = threshold
    try:
        schema = pa.schema([("url", pa.string()),
                            ("warc_ts", pa.timestamp("us")),
                            ("offset", pa.int64())])
        t = LakeTable.create(d, "pages", schema, P)
        m = synth_manifest(0)
        t0 = time.perf_counter()
        t.commit_epoch(m)
        commit_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = t.manifest(0)
        read_s = time.perf_counter() - t0
        assert len(back["buckets"]) == P
        assert back["buckets"]["99999"]["digest"] == f"{99999:032x}"
        log_dir = os.path.join(d, "pages", "_log")
        files = sorted(os.listdir(log_dir))
        sizes = {f: os.path.getsize(os.path.join(log_dir, f)) for f in files}
        return {
            "commit_sec": round(commit_s, 3),
            "read_back_sec": round(read_s, 3),
            "log_files": len(files),
            "main_manifest_bytes": sizes[f"epoch-{0:05d}.json"],
            "total_log_bytes": sum(sizes.values()),
        }
    finally:
        lake_mod.MANIFEST_SHARD_THRESHOLD = old
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    out = {
        "buckets": P,
        "sharded": bench("sharded", 10_000),
        "single_json": bench("single", 10**9),
    }
    print(json.dumps(out, indent=1))

"""Regression tests for the round-4 self-review findings (lookahead kwarg
leak, z3 pre-epoch rows, bucketed-shuffle block-boundary contract)."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_nifi_ray.engine import CDCEngine
from geomesa_nifi_ray.synth import BinlogSpec, write_binlog


def test_lookahead_kwarg_survives_single_pending_epoch(ray_session, tmp_path):
    """A tailer configured with lookahead must keep working when a poll
    finds exactly ONE pending epoch (the pipelined gate needs >1, so the
    kwarg used to leak into apply_epoch and raise TypeError)."""
    meta = write_binlog(str(tmp_path / "binlog"),
                        BinlogSpec(num_events=400, num_urls=80,
                                   num_epochs=2, seed=5))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    # two pending epochs -> pipelined path consumes lookahead
    r = eng.replay_binlog(meta, catchup=False, lookahead=2)
    assert eng.table.committed_epoch() == 1 and len(r) == 2

    # one MORE epoch arrives: single-pending poll goes down the serial path
    meta2 = write_binlog(str(tmp_path / "binlog3"),
                         BinlogSpec(num_events=600, num_urls=80,
                                    num_epochs=3, seed=5))
    eng2 = CDCEngine(str(tmp_path / "lake"), num_buckets=4)  # same lake
    single = dict(meta2)
    single = {"epochs": meta2["epochs"][2:]}  # exactly one pending
    r2 = eng2.replay_binlog(single, catchup=False, lookahead=2)
    assert len(r2) == 1 and eng2.table.committed_epoch() == 2

    # and the catch-up path tolerates it too
    eng3 = CDCEngine(str(tmp_path / "lake_cu"), num_buckets=4)
    r3 = eng3.replay_binlog(meta, catchup=True, lookahead=2)
    assert eng3.table.committed_epoch() == 1 and len(r3) >= 1


def test_z3_filter_tolerates_pre_epoch_rows():
    """One pre-1970 row must be dropped by the indexed scan (like the
    plain predicate would), not crash the whole query; a pre-1970 QUERY
    WINDOW is rejected loudly at plan time."""
    from geomesa_nifi_ray.geometry import z3_bbox_time_filter, z3_encode

    day = 86_400_000_000
    t = pa.table({
        "lon": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "lat": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "ts": pa.array([5 * day, -1, 6 * day], pa.int64()),
    })
    out = z3_bbox_time_filter(t, "lon", "lat", "ts", (0.0, 0.0, 10.0, 10.0),
                              t0_us=0, t1_us=10 * day)
    assert sorted(out["ts"].to_pylist()) == [5 * day, 6 * day]

    # encode path: negative ts keys as null (like null ts), no crash
    b, z = z3_encode(t["lon"], t["lat"], t["ts"])
    assert b.null_count == 1 and z.null_count == 1

    with pytest.raises(ValueError, match="epoch 0"):
        z3_bbox_time_filter(t, "lon", "lat", "ts", (0.0, 0.0, 10.0, 10.0),
                            t0_us=-day, t1_us=day)


def test_bucketed_shuffle_bucket_content_deterministic_across_widths(
        ray_session):
    """The determinism contract is per BUCKET VALUE: for any physical
    exchange width, each bucket's rows (and their order) are identical.
    phys_partitions pins block boundaries when those too must reproduce."""
    import ray.data as rd

    from geomesa_nifi_ray.sampling import deterministic_shuffle

    n = 5000
    t = pa.table({"doc_id": [f"d{i}" for i in range(n)],
                  "v": list(range(n))})

    def buckets_of(phys):
        out = deterministic_shuffle(rd.from_arrow(t).repartition(6),
                                    "doc_id", layout="bucketed",
                                    phys_partitions=phys)
        per_bucket = {}
        for blk in out.iter_batches(batch_format="pyarrow"):
            for b in set(blk["_shuffle_bucket"].to_pylist()):
                rows = blk.filter(pa.compute.equal(blk["_shuffle_bucket"], b))
                per_bucket.setdefault(int(b), []).extend(
                    zip(rows["doc_id"].to_pylist(),
                        rows["shuffle_key"].to_pylist()))
        return per_bucket

    a = buckets_of(2)
    b = buckets_of(4)
    assert a == b
    assert sum(len(v) for v in a.values()) == n

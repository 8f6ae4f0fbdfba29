"""Regression tests for the core-file review findings (round 4, second
pass): heterogeneous-schema epoch reads, post-evolution snapshot fast
path, vacuum vs in-flight epochs, null order-column LWW parity, and the
int->float assignability gate."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geomesa_nifi_ray.engine import CDCEngine


def _epoch(eng, epoch, urls, langs, ts0, off0, ops=None):
    import ray.data

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
    eng.apply_epoch(ray.data.from_arrow(pa.table(t)), epoch=epoch,
                    offset_range=(off0, off0 + n - 1))


def test_egress_mixed_tomb_schemas_emit_delete_ops(ray_session, tmp_path):
    """An epoch whose FIRST-listed bucket file has no tombstones while a
    later bucket's file does must still emit _op='delete' for the deletes
    (a single multi-file read takes its schema from the first fragment and
    silently dropped _tomb)."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    # keys spread across several buckets
    urls = [f"https://m/{i}" for i in range(12)]
    _epoch(eng, 0, urls, ["en"] * 12, 1_000_000, 0)
    # epoch 1: upsert some keys AND delete some others — which buckets get
    # tombstones vs plain delta files is decided by key hashing, so with 4
    # buckets and 6+6 rows both mixed orders occur
    ups = urls[:6]
    dels = urls[6:]
    _epoch(eng, 1, ups + dels, ["de"] * 6 + [None] * 6, 2_000_000, 100,
           ops=[None] * 6 + ["delete"] * 6)
    ds = eng.table.epoch_changes_dataset(1, include_ops=True)
    rows = pa.concat_tables(
        [t for t in __import__("ray").get(ds.to_arrow_refs()) if t.num_rows],
        promote_options="permissive")
    got = dict(zip(rows["url"].to_pylist(), rows["_op"].to_pylist()))
    for u in dels:
        assert got[u] == "delete", f"{u} lost its delete op"
    for u in ups:
        assert got[u] == "upsert"


def test_snapshot_after_evolution_keeps_new_column(ray_session, tmp_path):
    """Untouched buckets keep pre-evolution files; the snapshot fast path
    must not let the first (old) fragment's schema drop the evolved
    column's DATA from newer buckets."""
    import ray.data

    from geomesa_nifi_ray.schema import CompatibilityMode

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4,
                    compatibility=CompatibilityMode.UPDATE)
    _epoch(eng, 0, [f"https://e/{i}" for i in range(8)], ["en"] * 8,
           1_000_000, 0)
    # epoch 1 evolves the schema (adds 'extra') but touches only ONE key
    t = pa.table({
        "url": pa.array(["https://e/0"]),
        "warc_ts": pa.array([2_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>y</p>"], pa.large_binary()),
        "lang": pa.array(["de"]),
        "offset": pa.array([100], pa.int64()),
        "extra": pa.array(["NEW"], pa.string()),
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=1, offset_range=(100, 100))
    # compact every bucket so no deltas remain -> the fast path WOULD fire
    eng.rewrite_epoch(lambda b: b)
    assert int(eng.table.meta["schema_version"]) > 0
    snap = eng.table.snapshot_table()
    assert "extra" in snap.column_names
    vals = dict(zip(snap["url"].to_pylist(), snap["extra"].to_pylist()))
    assert vals["https://e/0"] == "NEW"
    # the Dataset read agrees (this is the path that used read_parquet)
    ds = eng.table.snapshot_dataset(columns=["url", "extra"])
    rows = pa.concat_tables(
        [x for x in __import__("ray").get(ds.to_arrow_refs()) if x.num_rows],
        promote_options="permissive")
    got = dict(zip(rows["url"].to_pylist(), rows["extra"].to_pylist()))
    assert got["https://e/0"] == "NEW"


def test_vacuum_spares_inflight_epoch_files(ray_session, tmp_path):
    """Files flushed by a not-yet-committed epoch (numbered above the
    committed cursor) must survive vacuum — deleting them would let the
    eventual manifest commit point at vacuumed paths."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    _epoch(eng, 0, ["https://v/0", "https://v/1"], ["en", "de"], 1_000_000, 0)
    # simulate an in-flight epoch's flushed bucket file (epoch 1 > committed 0)
    some_bucket, some_entry = next(iter(eng.table.live_entries().items()))
    pending_rel = eng.table.bucket_file(some_bucket, 1, kind="base")
    pending_abs = eng.table.abs_path(pending_rel)
    eng.table.fs.makedirs(__import__("os").path.dirname(pending_abs))
    eng.table.fs.publish_parquet(
        pending_abs,
        eng.table.fs.read_parquet(eng.table.abs_path(some_entry["file"])))
    deleted = eng.table.vacuum(retain_epochs=1)
    assert pending_rel not in deleted
    assert eng.table.fs.exists(pending_abs)


def test_null_order_value_loses_lww(ray_session, tmp_path):
    """A change row with a NULL order column must LOSE to any real value —
    matching both the delta path's lex_ge verdict and the SQL oracle's
    NULLS-LAST-in-DESC ranking (it used to surface as NaN, sort last under
    np.lexsort, and WIN)."""
    from geomesa_nifi_ray.upsert import lww_dedupe

    t = pa.table({
        "url": pa.array(["a", "a", "b"]),
        "warc_ts": pa.array([1_000, 1_000, 1_000], pa.int64()),
        "offset": pa.array([5, None, None], pa.int64()),
    })
    out = lww_dedupe(t, "url", ["warc_ts", "offset"])
    got = dict(zip(out["url"].to_pylist(), out["offset"].to_pylist()))
    assert got["a"] == 5          # real offset beats null
    assert got["b"] is None       # sole version survives
    # null keys must not crash (undefined NaN->int cast before the round-2
    # fix) NOR merge: distinct null-key rows are unrelated and pass through
    # as singletons (round-5 fix of the round-4 ADVICE finding — the old
    # behavior collapsed them to one surviving row)
    t2 = pa.table({
        "url": pa.array(["a", None, None]),
        "warc_ts": pa.array([1, 2, 3], pa.int64()),
        "offset": pa.array([1, 2, 3], pa.int64()),
    })
    out2 = lww_dedupe(t2, "url", ["warc_ts", "offset"])
    assert out2.num_rows == 3  # 'a' + BOTH null-key rows survive
    assert sorted(out2.filter(pa.compute.is_null(out2["url"]))
                  ["warc_ts"].to_pylist()) == [2, 3]


def test_int_float_assignability_is_exact_only():
    """'assignable' promises the projection's safe cast cannot fail:
    int64 -> float64 must be REJECTED at the gate (values above 2^53
    raise ArrowInvalid mid-epoch), while int32 -> float64 and
    int16 -> float32 stay accepted."""
    from geomesa_nifi_ray.schema import (CompatibilityMode, SchemaError,
                                         merge_schemas)

    stored = pa.schema([pa.field("url", pa.string()),
                        pa.field("x", pa.float64())])
    ok = pa.schema([pa.field("url", pa.string()),
                    pa.field("x", pa.int32())])
    merge_schemas(stored, ok, CompatibilityMode.EXISTING)  # no raise

    bad = pa.schema([pa.field("url", pa.string()),
                     pa.field("x", pa.int64())])
    with pytest.raises(SchemaError):
        merge_schemas(stored, bad, CompatibilityMode.EXISTING)

    stored32 = pa.schema([pa.field("x", pa.float32())])
    with pytest.raises(SchemaError):
        merge_schemas(stored32, pa.schema([pa.field("x", pa.int32())]),
                      CompatibilityMode.EXISTING)
    merge_schemas(stored32, pa.schema([pa.field("x", pa.int16())]),
                  CompatibilityMode.EXISTING)  # exact: no raise

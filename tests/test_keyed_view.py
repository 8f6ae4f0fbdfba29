"""KeyedGroupCountView: the high-cardinality incremental materialized view
whose state is itself a CDC lake table maintained by the generic engine
(VERDICT r3 item #10). Invariants under test:

* incremental == full recompute after every source epoch (upserts,
  updates, deletes, truncate, re-upsert-after-delete),
* epoch parity: view cursor == source committed epoch, crash/resume via
  the engine's exactly-once commit (no side state file),
* zero-count groups leave as tombstones (no lingering n=0 rows),
* rebuild() bootstraps mid-history in ONE catch-up epoch and clears
  stale groups after an out-of-band source rewrite,
* a no-change source epoch still advances the cursor.
"""

import collections

import pyarrow as pa
import pytest

from geomesa_nifi_ray.engine import CDCEngine


def _lang_counts_of(snap):
    return {k: v for k, v in
            collections.Counter(snap["lang"].to_pylist()).items()
            if k is not None}


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


def _mkview(eng, tmp_path, name="kview"):
    from geomesa_nifi_ray.derived import KeyedGroupCountView

    return KeyedGroupCountView(eng.table, str(tmp_path / name),
                               group_col="lang", num_buckets=4)


def test_keyed_view_tracks_upserts_deletes_truncate(ray_session, tmp_path):
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = _mkview(eng, tmp_path)

    _epoch(eng, 0, [f"https://k/{i}" for i in range(6)],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    assert view.refresh() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())
    assert view.last_epoch() == 0

    # update: one key flips de -> en (net +-1 across groups)
    _epoch(eng, 1, ["https://k/2"], ["en"], 2_000_000, 10)
    view.refresh()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    # delete both fr keys: 'fr' count hits 0 and must LEAVE the view table
    _epoch(eng, 2, ["https://k/4", "https://k/5"], [None, None],
           3_000_000, 20, ops=["delete", "delete"])
    view.refresh()
    expect = _lang_counts_of(eng.table.snapshot_table())
    assert view.counts() == expect
    assert "fr" not in view.counts()
    assert "fr" not in view.engine.table.snapshot_table()["k"].to_pylist()

    # re-upsert one fr key after the delete
    _epoch(eng, 3, ["https://k/4"], ["fr"], 4_000_000, 30)
    view.refresh()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())
    assert view.counts().get("fr") == 1

    # source truncate -> view truncate at the same epoch number
    eng.truncate()
    assert view.refresh() == 1
    assert view.counts() == {}
    assert view.last_epoch() == eng.table.committed_epoch()

    # ingest resumes after the clear and the view follows
    _epoch(eng, 5, ["https://k/9"], ["ru"], 5_000_000, 40)
    view.refresh()
    assert view.counts() == {"ru": 1}

    # idempotent: nothing new
    assert view.refresh() == 0


def test_keyed_view_matches_json_view(ray_session, tmp_path):
    from geomesa_nifi_ray.derived import GroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    jview = GroupCountView(eng.table, str(tmp_path / "jview"), group_col="lang")
    kview = _mkview(eng, tmp_path)
    _epoch(eng, 0, [f"https://k/{i}" for i in range(8)],
           ["en", "de", "fr", "pt", "en", "de", "fr", "pt"], 1_000_000, 0)
    _epoch(eng, 1, ["https://k/0", "https://k/3"], ["de", None],
           2_000_000, 10, ops=[None, "delete"])
    jview.refresh()
    kview.refresh()
    assert kview.counts() == jview.counts()


def test_keyed_view_crash_resume(ray_session, tmp_path, monkeypatch):
    """Crash after the first of two pending epochs: a fresh view instance
    over the same root resumes from the engine cursor and converges."""
    import geomesa_nifi_ray.derived as derived

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = _mkview(eng, tmp_path)
    _epoch(eng, 0, [f"https://k/{i}" for i in range(4)],
           ["en", "en", "de", "fr"], 1_000_000, 0)
    _epoch(eng, 1, ["https://k/1", "https://k/3"], ["de", "de"],
           2_000_000, 10)

    real = derived.epoch_group_delta
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between epochs")
        return real(*a, **kw)

    monkeypatch.setattr(derived, "epoch_group_delta", flaky)
    with pytest.raises(RuntimeError):
        view.refresh()
    assert view.last_epoch() == 0  # epoch 0 committed, epoch 1 not
    monkeypatch.setattr(derived, "epoch_group_delta", real)

    view2 = _mkview(eng, tmp_path)  # same root: resumes from disk
    assert view2.refresh() == 1
    assert view2.counts() == _lang_counts_of(eng.table.snapshot_table())


def test_keyed_view_rebuild_bootstrap_and_stale_groups(ray_session, tmp_path):
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    _epoch(eng, 0, [f"https://k/{i}" for i in range(6)],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    _epoch(eng, 1, ["https://k/0"], ["pt"], 2_000_000, 10)

    # bootstrap mid-history: one catch-up epoch lands the cursor at source
    view = _mkview(eng, tmp_path)
    view.rebuild()
    assert view.last_epoch() == eng.table.committed_epoch() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    # incremental refresh continues seamlessly after the bootstrap
    _epoch(eng, 2, ["https://k/1"], ["pt"], 3_000_000, 20)
    assert view.refresh() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    # out-of-band rewrite: every de/fr/pt becomes 'xx' -> stale groups must
    # leave the view on rebuild
    import pyarrow.compute as pc

    def rw(batch):
        lang = batch["lang"]
        new = pc.if_else(pc.equal(pc.fill_null(lang, ""), "en"), lang,
                         pa.scalar("xx", pa.string()))
        return batch.set_column(batch.column_names.index("lang"), "lang", new)

    eng.rewrite_epoch(rw)
    view.rebuild()
    assert view.last_epoch() == eng.table.committed_epoch()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())
    for stale in ("de", "fr", "pt"):
        assert stale not in view.counts()


def test_keyed_view_no_change_epoch_advances_cursor(ray_session, tmp_path):
    """An epoch whose events all LOSE the LWW (stale timestamps) produces an
    empty delta; the view must still commit an epoch to keep 1:1 parity."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = _mkview(eng, tmp_path)
    _epoch(eng, 0, ["https://k/0", "https://k/1"], ["en", "de"], 5_000_000, 0)
    view.refresh()
    before = view.counts()
    # stale replay: older warc_ts loses against the stored winners
    _epoch(eng, 1, ["https://k/0"], ["zz"], 1_000, 10)
    assert view.refresh() == 1
    assert view.last_epoch() == 1
    assert view.counts() == before
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())


def test_keyed_view_high_cardinality_incremental_equals_recompute(
        ray_session, tmp_path):
    """~1.5k distinct groups over three epochs: incremental == recompute
    and == a from-scratch rebuild. (The 10^5-group sf0.1 evidence runs in
    tools/keyed_view_scale.py and is recorded in BASELINE.md.)"""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    view = _mkview(eng, tmp_path)
    n = 3000
    urls = [f"https://k/{i}" for i in range(n)]
    langs = [f"g{i % 1500:04d}" for i in range(n)]
    _epoch(eng, 0, urls, langs, 1_000_000, 0)
    view.refresh()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    # epoch 1: 500 keys migrate to new groups, 100 keys deleted
    mig = [f"https://k/{i}" for i in range(500)]
    migl = [f"h{i % 400:04d}" for i in range(500)]
    _epoch(eng, 1, mig, migl, 2_000_000, 10_000)
    dele = [f"https://k/{i}" for i in range(500, 600)]
    _epoch(eng, 2, dele, [None] * 100, 3_000_000, 20_000,
           ops=["delete"] * 100)
    view.refresh()
    expect = _lang_counts_of(eng.table.snapshot_table())
    assert view.counts() == expect

    fresh = _mkview(eng, tmp_path, name="kview2")
    fresh.rebuild()
    assert fresh.counts() == expect


def test_keyed_view_catchup_source_epoch_span(ray_session, tmp_path):
    """A catch-up source lake commits ONE manifest covering an epoch span
    (epochs_covered) — the view must mirror the span, not assume
    sequential-from-0 numbering."""
    import ray.data

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = _mkview(eng, tmp_path)
    t = pa.table({
        "url": pa.array([f"https://k/{i}" for i in range(6)]),
        "warc_ts": pa.array([1_000_000 + i for i in range(6)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>"] * 6, pa.large_binary()),
        "lang": pa.array(["en", "en", "de", "de", "fr", "fr"]),
        "offset": pa.array(list(range(6)), pa.int64()),
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=2, offset_range=(0, 5),
                    epochs_covered=(0, 2))
    assert view.refresh() == 1
    assert view.last_epoch() == 2
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())
    # a sequential epoch after the catch-up span continues normally
    _epoch(eng, 3, ["https://k/0"], ["pt"], 2_000_000, 10)
    assert view.refresh() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())


def test_keyed_view_distributed_refresh_equals_driver_path(
        ray_session, tmp_path):
    """refresh(distributed=True) — partial-delta Dataset hash-exchanged to
    view buckets, no driver delta dict — must produce identical view state
    across upserts, group migration, deletes-to-zero and a truncate."""
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    dview = _mkview(eng, tmp_path, name="dview")
    jview = _mkview(eng, tmp_path, name="jview")

    n = 1200
    _epoch(eng, 0, [f"https://k/{i}" for i in range(n)],
           [f"g{i % 300:03d}" for i in range(n)], 1_000_000, 0)
    _epoch(eng, 1, [f"https://k/{i}" for i in range(200)],
           [f"h{i % 50:03d}" for i in range(200)], 2_000_000, 10_000)
    _epoch(eng, 2, [f"https://k/{i}" for i in range(200, 260)], [None] * 60,
           3_000_000, 20_000, ops=["delete"] * 60)

    assert dview.refresh(distributed=True) == 3
    assert jview.refresh() == 3
    expect = _lang_counts_of(eng.table.snapshot_table())
    assert dview.counts() == expect
    assert jview.counts() == expect

    # truncate + resume through the distributed path too
    eng.truncate()
    _epoch(eng, 4, ["https://k/z"], ["zz"], 4_000_000, 30_000)
    assert dview.refresh(distributed=True) == 2
    assert dview.counts() == {"zz": 1}

    # idempotent
    assert dview.refresh(distributed=True) == 0


def test_keyed_view_over_object_store_fs(ray_session, tmp_path):
    """Source lake AND view lake on the no-rename object-store-style
    filesystem: deltas, point lookups and the distributed refresh all go
    through the LakeFS seam (read_parquet_schema / read_parquet /
    publish_*), so the whole CDC-on-CDC loop must survive an S3-like
    backend."""
    from geomesa_nifi_ray.derived import KeyedGroupCountView
    from geomesa_nifi_ray.testing import object_store_sim_fs

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2,
                    lake_fs=object_store_sim_fs())
    view = KeyedGroupCountView(eng.table, str(tmp_path / "view"),
                               group_col="lang", num_buckets=4,
                               lake_fs=object_store_sim_fs())
    _epoch(eng, 0, [f"https://k/{i}" for i in range(6)],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    assert view.refresh() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    _epoch(eng, 1, ["https://k/4", "https://k/5"], [None, None],
           2_000_000, 10, ops=["delete", "delete"])
    assert view.refresh(distributed=True) == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())
    assert "fr" not in view.counts()

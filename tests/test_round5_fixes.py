"""Round-5 regression tests for the round-4 ADVICE.md findings.

1. (medium) KeyedGroupCountView.refresh() across a ``rewrite_epoch``
   manifest must not advance the cursor with an empty delta — the view
   would be permanently stale and rebuild()'s cursor guard would no-op.
   refresh() now recomputes at the rewrite epoch; rebuild(force=True)
   repairs legacy-stale views by resetting the view table.
2. GroupCountView / GroupSumView (JSON state) refresh() across a rewrite
   epoch recomputes instead of applying an empty delta.
3. epoch_group_delta's plus side null-fills a genuinely missing value
   column (pre-evolution epoch files) instead of raising KeyError.
4. LWW kernels: distinct null-key rows must each survive (never merge
   into one).
5. epoch_changes_dataset(include_ops=True) keeps the ``_op`` column on
   the empty-epoch early return and on empty control batches.
"""

import collections

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geomesa_nifi_ray.engine import CDCEngine


def _lang_counts_of(snap):
    return {k: v for k, v in
            collections.Counter(snap["lang"].to_pylist()).items()
            if k is not None}


def _epoch(eng, epoch, urls, langs, ts0, off0, ops=None, htmls=None):
    import ray.data

    n = len(urls)
    t = {
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(
            htmls if htmls is not None else
            [None if (ops and ops[i] == "delete") else b"<p>x</p>"
             for i in range(n)], pa.large_binary()),
        "lang": pa.array(langs, pa.string()),
        "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
    }
    if ops:
        t["_op"] = pa.array(ops, pa.string())
    eng.apply_epoch(ray.data.from_arrow(pa.table(t)), epoch=epoch,
                    offset_range=(off0, off0 + n - 1))


def _rewrite_langs(eng):
    """Out-of-band rewrite: every non-'en' lang becomes 'xx'."""
    def rw(batch):
        lang = batch["lang"]
        new = pc.if_else(pc.equal(pc.fill_null(lang, ""), "en"), lang,
                         pa.scalar("xx", pa.string()))
        return batch.set_column(batch.column_names.index("lang"), "lang", new)

    eng.rewrite_epoch(rw)


# -- 1: keyed view vs rewrite epochs ---------------------------------------

def test_keyed_view_refresh_recomputes_across_rewrite(ray_session, tmp_path):
    from geomesa_nifi_ray.derived import KeyedGroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = KeyedGroupCountView(eng.table, str(tmp_path / "kview"),
                               group_col="lang", num_buckets=4)
    _epoch(eng, 0, [f"https://k/{i}" for i in range(6)],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    assert view.refresh() == 1
    _rewrite_langs(eng)  # commits a mode='rewrite' manifest (epoch 1)

    # refresh alone must land the correct counts — no rebuild() needed
    assert view.refresh() == 1
    assert view.last_epoch() == eng.table.committed_epoch() == 1
    expect = _lang_counts_of(eng.table.snapshot_table())
    assert view.counts() == expect == {"en": 2, "xx": 4}
    for stale in ("de", "fr"):
        assert stale not in view.counts()

    # and incremental refresh continues seamlessly after the rewrite
    _epoch(eng, 2, ["https://k/0"], ["pt"], 2_000_000, 10)
    assert view.refresh() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())


def test_keyed_view_rebuild_force_repairs_stale_parity(ray_session, tmp_path):
    """A view whose cursor reached the source's committed epoch with stale
    counts (the legacy empty-delta-over-rewrite trap): rebuild() is a no-op
    by the cursor guard, rebuild(force=True) must repair."""
    from geomesa_nifi_ray.derived import KeyedGroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = KeyedGroupCountView(eng.table, str(tmp_path / "kview"),
                               group_col="lang", num_buckets=4)
    _epoch(eng, 0, [f"https://k/{i}" for i in range(6)],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    view.refresh()
    _rewrite_langs(eng)
    # replicate the legacy behavior: commit an EMPTY view epoch over the
    # rewrite, leaving the cursor at parity with stale counts
    view._commit_events({}, [], epoch=1, epochs_covered=(1, 1))
    assert view.last_epoch() == eng.table.committed_epoch() == 1
    stale = view.counts()
    assert stale == {"en": 2, "de": 2, "fr": 2}  # wrong: rewrite not seen

    view.rebuild()  # guard: cursor at parity -> no-op
    assert view.counts() == stale

    view.rebuild(force=True)
    expect = _lang_counts_of(eng.table.snapshot_table())
    assert view.counts() == expect == {"en": 2, "xx": 4}
    assert view.last_epoch() == eng.table.committed_epoch()

    # the reset view keeps working incrementally afterwards
    _epoch(eng, 2, ["https://k/1"], ["pt"], 2_000_000, 10)
    assert view.refresh() == 1
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())


def test_keyed_view_distributed_refresh_across_rewrite(ray_session, tmp_path):
    from geomesa_nifi_ray.derived import KeyedGroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    view = KeyedGroupCountView(eng.table, str(tmp_path / "kview"),
                               group_col="lang", num_buckets=4)
    _epoch(eng, 0, [f"https://k/{i}" for i in range(6)],
           ["en", "en", "de", "de", "fr", "fr"], 1_000_000, 0)
    _rewrite_langs(eng)
    assert view.refresh(distributed=True) == 2
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())
    assert view.last_epoch() == eng.table.committed_epoch()


# -- 2: JSON views vs rewrite epochs ---------------------------------------

def test_json_views_refresh_recompute_across_rewrite(ray_session, tmp_path):
    from geomesa_nifi_ray.derived import GroupCountView, GroupSumView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    cview = GroupCountView(eng.table, str(tmp_path / "v"), group_col="lang")
    sview = GroupSumView(eng.table, str(tmp_path / "v"), group_col="lang",
                         value_col="text", value_kernel="utf8_length")
    _epoch(eng, 0, [f"https://k/{i}" for i in range(4)],
           ["en", "en", "de", "fr"], 1_000_000, 0,
           htmls=[b"<p>aa</p>", b"<p>bbb</p>", b"<p>cccc</p>", b"<p>d</p>"])
    assert cview.refresh() == 1 and sview.refresh() == 1
    _rewrite_langs(eng)
    assert cview.refresh() == 1
    assert sview.refresh() == 1
    assert cview.counts() == _lang_counts_of(eng.table.snapshot_table())
    assert cview.counts() == {"en": 2, "xx": 2}
    assert sview.counts() == {"en": 5, "xx": 5}
    # cursor parity: a later normal epoch still applies incrementally
    _epoch(eng, 2, ["https://k/0"], ["pt"], 2_000_000, 10,
           htmls=[b"<p>zz</p>"])
    assert cview.refresh() == 1 and sview.refresh() == 1
    assert cview.counts() == _lang_counts_of(eng.table.snapshot_table())
    assert sview.counts() == {"en": 3, "xx": 5, "pt": 2}


# -- 3: plus-side value column missing from a pre-evolution epoch file -----

def test_sum_view_over_pre_evolution_epoch_files(ray_session, tmp_path):
    """Epoch 0 is written BEFORE the value column exists; the sum view's
    delta read of that epoch file must null-fill (contribute nothing), not
    raise KeyError."""
    import ray.data

    from geomesa_nifi_ray.derived import GroupSumView
    from geomesa_nifi_ray.engine import make_generic_convert_fn

    v0 = pa.schema([
        pa.field("k", pa.string()),
        pa.field("g", pa.string()),
        pa.field("offset", pa.int64()),
        pa.field("content_hash", pa.string()),
    ])
    v1 = v0.insert(2, pa.field("v", pa.string()))
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2, schema=v0,
                    key="k", order=("offset",),
                    convert_fn_factory=make_generic_convert_fn)

    def events(rows, epoch, off0):
        t = pa.table({
            "k": pa.array([r[0] for r in rows], pa.string()),
            "g": pa.array([r[1] for r in rows], pa.string()),
            "offset": pa.array([off0 + i for i in range(len(rows))],
                               pa.int64()),
            **({"v": pa.array([r[2] for r in rows], pa.string())}
               if len(rows[0]) > 2 else {}),
        })
        eng.apply_epoch(ray.data.from_arrow(t), epoch=epoch,
                        offset_range=(off0, off0 + len(rows) - 1))

    events([("k0", "en"), ("k1", "en"), ("k2", "de"), ("k3", "fr")],
           epoch=0, off0=0)
    assert "v" not in eng.table.fs.read_parquet_schema(
        eng.table.abs_path(
            next(iter(eng.table.manifest(0)["buckets"].values()))["file"])
    ).names
    # additive evolution: the stored schema gains `v`
    eng.table.set_schema(v1)
    events([("k4", "en", "hello")], epoch=1, off0=10)

    sview = GroupSumView(eng.table, str(tmp_path / "vw"), group_col="g",
                         value_col="v", value_kernel="utf8_length")
    assert sview.refresh() == 2  # epoch 0 (no value column) + epoch 1
    # epoch-0 rows contribute nothing (null v); sparse contract: zero-sum
    # groups (de/fr, and en's epoch-0 rows) are not materialized
    assert sview.counts() == {"en": 5}

    fresh = GroupSumView(eng.table, str(tmp_path / "vw2"), group_col="g",
                         value_col="v", value_kernel="utf8_length")
    fresh.rebuild()
    assert fresh.counts() == sview.counts()


# -- 4: null keys never LWW-merge -------------------------------------------

def test_lww_null_keys_pass_through_as_singletons():
    from geomesa_nifi_ray.upsert import lww_dedupe

    t = pa.table({
        "url": pa.array([None, "a", None, None, "a"], pa.string()),
        "warc_ts": pa.array([5, 1, 3, 4, 2], pa.int64()),
        "offset": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    out = lww_dedupe(t, "url", ["warc_ts", "offset"])
    # 'a' dedupes to its winner; every null-key row survives untouched
    assert out.num_rows == 4
    keys = out["url"].to_pylist()
    assert keys.count(None) == 3
    a_rows = out.filter(pc.equal(pc.fill_null(out["url"], ""), "a"))
    assert a_rows["warc_ts"].to_pylist() == [2]
    null_ts = sorted(out.filter(pc.is_null(out["url"]))["warc_ts"].to_pylist())
    assert null_ts == [3, 4, 5]


# -- 5: epoch_changes_dataset include_ops schema stability -------------------

def test_epoch_changes_include_ops_empty_epoch_schema(ray_session, tmp_path):
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    _epoch(eng, 0, ["https://k/0", "https://k/1"], ["en", "de"], 5_000_000, 0)
    # stale replay: every event LOSES the LWW -> net rows_changed == 0
    _epoch(eng, 1, ["https://k/0"], ["zz"], 1_000, 10)
    ds = eng.table.epoch_changes_dataset(1, include_ops=True)
    assert "_op" in ds.schema().names
    assert ds.count() == 0


# -- 6: row-group key-skipping in the steady-state delta merge ---------------

def _pages_epoch(eng, epoch, urls, ts0, off0):
    import ray.data

    n = len(urls)
    t = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([ts0 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([f"<p>{u}@{ts0}</p>".encode() for u in urls],
                         pa.large_binary()),
        "lang": pa.array(["en"] * n, pa.string()),
        "offset": pa.array([off0 + i for i in range(n)], pa.int64()),
    })
    return eng.apply_epoch(ray.data.from_arrow(t), epoch=epoch,
                           offset_range=(off0, off0 + n - 1))


def test_delta_merge_skips_row_groups(ray_session, tmp_path):
    """A small epoch touching a narrow key range must skip chain row
    groups whose key [min,max] cannot contain its keys, with snapshots and
    manifests identical to an unpruned (single-row-group) control lake."""
    urls = [f"https://rg.test/{i:04d}" for i in range(1000)]
    sub = [f"https://rg.test/{i:04d}" for i in range(500, 505)]

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=1,
                    row_group_rows=50)
    _pages_epoch(eng, 0, urls, 1_000_000, 0)
    r = _pages_epoch(eng, 1, sub, 2_000_000, 10_000)
    assert r.row_groups_total == 20          # 1000 rows / 50 per group
    assert r.row_groups_skipped > 0          # the point of the feature
    assert r.row_groups_skipped < r.row_groups_total  # keys DO hit some

    # control: one giant row group -> nothing can be skipped
    ctl = CDCEngine(str(tmp_path / "ctl"), num_buckets=1)
    _pages_epoch(ctl, 0, urls, 1_000_000, 0)
    rc = _pages_epoch(ctl, 1, sub, 2_000_000, 10_000)
    assert rc.row_groups_skipped == 0

    # pruning must not change any observable state: same digests, same
    # rows, same snapshot bytes-of-values
    mb = eng.table.manifest(1)["buckets"]
    cb = ctl.table.manifest(1)["buckets"]
    assert {b: (e["rows"], e["digest"]) for b, e in mb.items()} == \
           {b: (e["rows"], e["digest"]) for b, e in cb.items()}
    a = eng.table.snapshot_table()
    b = ctl.table.snapshot_table()
    assert a.equals(b)
    # updated keys carry the epoch-1 payloads
    hit = a.filter(pc.is_in(a["url"], value_set=pa.array(sub)))
    assert hit.num_rows == len(sub)
    assert all("@2000000" in t for t in hit["text"].to_pylist())


def test_delta_merge_prunes_deletes_too(ray_session, tmp_path):
    """Tombstone-bearing small epochs go through the same pruned chain
    read; deletes still apply exactly."""
    import ray.data

    urls = [f"https://rg.test/{i:04d}" for i in range(600)]
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=1,
                    row_group_rows=50)
    _pages_epoch(eng, 0, urls, 1_000_000, 0)
    dele = [f"https://rg.test/{i:04d}" for i in range(100, 103)]
    t = pa.table({
        "url": pa.array(dele),
        "warc_ts": pa.array([2_000_000 + i for i in range(3)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([None] * 3, pa.large_binary()),
        "lang": pa.array([None] * 3, pa.string()),
        "offset": pa.array([10_000 + i for i in range(3)], pa.int64()),
        "_op": pa.array(["delete"] * 3, pa.string()),
    })
    r = eng.apply_epoch(ray.data.from_arrow(t), epoch=1,
                        offset_range=(10_000, 10_002))
    assert r.rows_deleted == 3
    assert r.row_groups_skipped > 0
    snap = eng.table.snapshot_table()
    assert snap.num_rows == 597
    assert not set(dele) & set(snap["url"].to_pylist())


# -- 7: manifest sharding above the bucket threshold --------------------------

def test_manifest_sharding_crash_resume(ray_session, tmp_path, monkeypatch):
    """Above MANIFEST_SHARD_THRESHOLD the bucket map shards into range
    files; manifest() reassembles transparently, the main JSON stays the
    atomic linearization point, and crash/resume + reads behave exactly
    like the single-JSON log."""
    import glob
    import os

    import geomesa_nifi_ray.lake as lake_mod

    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_SIZE", 3)

    lake = str(tmp_path / "lake")
    eng = CDCEngine(lake, num_buckets=16)
    urls = [f"https://s/{i:03d}" for i in range(200)]  # touches all 16
    _epoch(eng, 0, urls, ["en"] * 200, 1_000_000, 0)

    raw = eng.table.fs.read_json(eng.table._log_path(0))
    assert "buckets" not in raw
    sh = raw["buckets_sharded"]
    assert sh["count"] == 16 and sh["shards"] == 6  # ceil(16/3)
    assert len(glob.glob(os.path.join(lake, "pages", "_log",
                                      "shards-00000-*.json"))) == 6
    # reassembly is complete and ordered ranges cover every bucket
    m = eng.table.manifest(0)
    assert len(m["buckets"]) == 16
    assert sorted(int(b) for b in m["buckets"]) == list(range(16))
    # manifest_epochs must not mistake shard files for manifests
    assert eng.table.manifest_epochs() == [0]

    # a small follow-up epoch stays single-JSON (4 >= touched buckets is
    # not guaranteed; just assert reads work and rows land)
    _epoch(eng, 1, urls[:3], ["de"] * 3, 2_000_000, 1_000)
    want = eng.table.snapshot_table()
    digests = {b: e["digest"] for b, e in
               eng.table.manifest(1)["buckets"].items()}

    # crash: the newest manifest vanishes (shards may survive — orphans)
    os.remove(eng.table._log_path(1))
    eng2 = CDCEngine(lake, num_buckets=16)
    assert eng2.table.committed_epoch() == 0
    _epoch(eng2, 1, urls[:3], ["de"] * 3, 2_000_000, 1_000)
    assert eng2.table.snapshot_table().equals(want)
    assert {b: e["digest"] for b, e in
            eng2.table.manifest(1)["buckets"].items()} == digests

    # snapshot/time-travel through the sharded epoch-0 manifest
    assert eng2.table.snapshot_table(epoch=0).num_rows == 200
    assert eng2.table.vacuum(retain_epochs=2) == []  # all chains live


def test_manifest_bucket_filtered_shard_reads(ray_session, tmp_path,
                                              monkeypatch):
    """manifest(epoch, buckets=...) fetches only the shard files whose
    recorded bucket ranges intersect — with entries identical to the full
    reassembly."""
    import geomesa_nifi_ray.lake as lake_mod

    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_THRESHOLD", 4)
    monkeypatch.setattr(lake_mod, "MANIFEST_SHARD_SIZE", 3)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=16)
    _epoch(eng, 0, [f"https://s/{i:03d}" for i in range(200)],
           ["en"] * 200, 1_000_000, 0)
    t = eng.table
    full = t.manifest(0)["buckets"]
    assert len(full) == 16

    calls: list[str] = []
    real = t.fs.read_json
    monkeypatch.setattr(
        t.fs, "read_json", lambda p: (calls.append(p), real(p))[1])

    sub = t.manifest(0, buckets=[0, 1])["buckets"]
    shard_reads = [p for p in calls if "shards-" in p]
    assert len(shard_reads) == 1          # buckets 0,1 live in shard 0
    assert sub["0"] == full["0"] and sub["1"] == full["1"]

    calls.clear()
    sub = t.manifest(0, buckets=[15])["buckets"]
    assert len([p for p in calls if "shards-" in p]) == 1
    assert sub["15"] == full["15"]

    calls.clear()
    sub = t.manifest(0, buckets=[0, 15])["buckets"]
    assert len([p for p in calls if "shards-" in p]) == 2
    # live_entries passthrough
    le = t.live_entries(0, buckets=[5])
    assert le[5] == full["5"]


# -- 7: views whose GROUP column was added by schema evolution ---------------

def test_views_over_group_col_added_by_evolution(ray_session, tmp_path):
    """A count view can group by a column that pre-evolution epoch files
    lack: the delta reader null-fills the missing GROUP column (null
    groups are skipped, same rule as the rebuild path) instead of
    raising on the projected read. Incremental == rebuild across the
    evolution boundary, and an update that GIVES a key a group value
    increments exactly once (its prev row had a null group)."""
    import ray.data

    from geomesa_nifi_ray.derived import GroupCountView, KeyedGroupCountView
    from geomesa_nifi_ray.schema import CompatibilityMode

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2,
                    compatibility=CompatibilityMode.UPDATE)

    def ep(e, urls, off, host=None):
        n = len(urls)
        cols = {
            "url": pa.array(urls),
            "warc_ts": pa.array([1_000_000 + off + i for i in range(n)],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array([b"<p>x</p>"] * n, pa.large_binary()),
            "lang": pa.array(["en"] * n),
            "offset": pa.array(list(range(off, off + n)), pa.int64()),
        }
        if host is not None:
            cols["host"] = pa.array(host)
        eng.apply_epoch(ray.data.from_arrow(pa.table(cols)), epoch=e,
                        offset_range=(off, off + n - 1))

    ep(0, ["https://a/1", "https://b/2"], 0)                    # no host col
    ep(1, ["https://a/3", "https://c/4"], 10, host=["a", "c"])  # +host

    v = GroupCountView(eng.table, str(tmp_path / "v"), group_col="host")
    v.refresh()
    assert v.counts() == {"a": 1, "c": 1}
    kv = KeyedGroupCountView(eng.table, str(tmp_path / "kv"),
                             group_col="host")
    kv.refresh()
    assert kv.counts() == {"a": 1, "c": 1}
    v.rebuild()
    assert v.counts() == {"a": 1, "c": 1}       # incremental == recompute

    ep(2, ["https://a/1"], 20, host=["a"])      # null-group key gains one
    v.refresh()
    kv.refresh()
    assert v.counts() == {"a": 2, "c": 1}
    assert kv.counts() == {"a": 2, "c": 1}

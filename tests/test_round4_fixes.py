"""Round-4 fixes: regression tests for ADVICE.md items and round-4 verdict
work (derived-view tombstone delta, truncate-aware views, hashing kernel
fingerprint, GML NCName sanitization)."""

import collections

import pyarrow as pa
import pytest

from geomesa_nifi_ray.engine import CDCEngine


def _lang_counts_of(snap):
    return {k: v for k, v in
            collections.Counter(snap["lang"].to_pylist()).items()
            if k is not None}


def _base_epoch(eng, n=6):
    import ray.data

    base = pa.table({
        "url": pa.array([f"https://v/{i}" for i in range(n)]),
        "warc_ts": pa.array([1_000_000 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>"] * n, pa.large_binary()),
        "lang": pa.array((["en", "de", "fr"] * n)[:n]),
        "offset": pa.array(list(range(n)), pa.int64()),
    })
    eng.apply_epoch(ray.data.from_arrow(base), epoch=0,
                    offset_range=(0, n - 1))


# --------------------- ADVICE high: tombstone wins the prev-chain LWW --


def test_view_delete_then_reupsert(ray_session, tmp_path):
    """Delete a key in epoch 1, re-upsert it in epoch 2: the view's
    prev-chain read at epoch 2 must see the tombstone as 'no previous
    value' (subtract nothing), not subtract a phantom null group."""
    import ray.data

    from geomesa_nifi_ray.derived import GroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    _base_epoch(eng)
    view = GroupCountView(eng.table, str(tmp_path / "views"), group_col="lang")
    view.refresh()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    dels = pa.table({
        "url": pa.array(["https://v/0"]),
        "warc_ts": pa.array([9_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([None], pa.large_binary()),
        "lang": pa.array([None], pa.string()),
        "offset": pa.array([10], pa.int64()),
        "_op": pa.array(["delete"]),
    })
    eng.apply_epoch(ray.data.from_arrow(dels), epoch=1, offset_range=(10, 10))
    view.refresh()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())

    res = pa.table({
        "url": pa.array(["https://v/0"]),
        "warc_ts": pa.array([11_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>back</p>"], pa.large_binary()),
        "lang": pa.array(["zh"]),
        "offset": pa.array([20], pa.int64()),
    })
    eng.apply_epoch(ray.data.from_arrow(res), epoch=2, offset_range=(20, 20))
    view.refresh()          # pre-fix: TypeError (None key) or phantom -null
    expect = _lang_counts_of(eng.table.snapshot_table())
    assert view.counts() == expect
    assert view.counts().get("zh") == 1
    # and the incremental state matches a from-scratch rebuild exactly
    view2 = GroupCountView(eng.table, str(tmp_path / "views2"),
                           group_col="lang")
    view2.rebuild()
    assert view2.counts() == view.counts()


def test_view_delete_only_epoch_subtracts(ray_session, tmp_path):
    """A pure-delete epoch must subtract the deleted keys' old groups."""
    import ray.data

    from geomesa_nifi_ray.derived import GroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    _base_epoch(eng)
    view = GroupCountView(eng.table, str(tmp_path / "views"), group_col="lang")
    view.refresh()
    dels = pa.table({
        "url": pa.array(["https://v/1", "https://v/2"]),
        "warc_ts": pa.array([9_000_000, 9_000_001],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([None, None], pa.large_binary()),
        "lang": pa.array([None, None], pa.string()),
        "offset": pa.array([10, 11], pa.int64()),
        "_op": pa.array(["delete", "delete"]),
    })
    eng.apply_epoch(ray.data.from_arrow(dels), epoch=1, offset_range=(10, 11))
    view.refresh()
    assert view.counts() == _lang_counts_of(eng.table.snapshot_table())


# ------------------- ADVICE medium: truncate epoch resets the view --


def test_view_truncate_resets_counts(ray_session, tmp_path):
    """After eng.truncate() the incremental view must report {} (it used
    to silently keep the stale pre-truncate counts)."""
    import ray.data

    from geomesa_nifi_ray.derived import GroupCountView

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    _base_epoch(eng)
    view = GroupCountView(eng.table, str(tmp_path / "views"), group_col="lang")
    view.refresh()
    assert view.counts() != {}
    eng.truncate()
    assert view.refresh() == 1
    assert view.counts() == {}
    # ingest resumes cleanly after the clear and the view follows
    nxt = pa.table({
        "url": pa.array(["https://v/после"]),
        "warc_ts": pa.array([12_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>n</p>"], pa.large_binary()),
        "lang": pa.array(["ru"]),
        "offset": pa.array([30], pa.int64()),
    })
    eng.apply_epoch(ray.data.from_arrow(nxt),
                    epoch=eng.table.committed_epoch() + 1,
                    offset_range=(30, 30))
    view.refresh()
    assert view.counts() == {"ru": 1}


# -------------- ADVICE low: xx64 kernel fingerprint stamped + verified --


def test_xx64_fingerprint_stamped_and_verified(tmp_path):
    import json
    import os

    from geomesa_nifi_ray.lake import TABLE_META, LakeTable

    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()), ("lang", pa.string()),
        ("offset", pa.int64()),
    ])
    t = LakeTable.create(str(tmp_path), "pages", schema, num_buckets=2,
                         content_hash_kernel="xx64")
    assert "content_hash_fingerprint" in t.meta
    # clean load verifies and succeeds
    LakeTable.load(str(tmp_path), "pages")
    # simulate a polars upgrade that changed hash values
    mp = os.path.join(str(tmp_path), "pages", TABLE_META)
    with open(mp) as f:
        meta = json.load(f)
    meta["content_hash_fingerprint"] = "0" * 16
    with open(mp, "w") as f:
        json.dump(meta, f)
    with pytest.raises(RuntimeError, match="fingerprint"):
        LakeTable.load(str(tmp_path), "pages")


def test_md5_tables_carry_no_fingerprint(tmp_path):
    from geomesa_nifi_ray.lake import LakeTable

    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("offset", pa.int64())])
    t = LakeTable.create(str(tmp_path), "p2", schema, num_buckets=2)
    assert "content_hash_fingerprint" not in t.meta
    LakeTable.load(str(tmp_path), "p2")  # no verification path for md5


# ---------------------- ADVICE low: GML column names must be NCNames --


def test_gml_sanitizes_bad_column_names():
    import xml.etree.ElementTree as ET

    from geomesa_nifi_ray.export import _encode_gml

    t = pa.table({
        "good": pa.array(["a"]),
        "has space": pa.array(["b"]),
        "ns:col": pa.array(["c"]),
        "1lead": pa.array(["d"]),
    })
    for version in ("gml", "gml2"):
        xml = _encode_gml(t, version)
        root = ET.fromstring(xml)       # pre-fix: ParseError
        text = xml.decode()
        assert "<has_space>b</has_space>" in text
        assert "<ns_col>c</ns_col>" in text
        assert "<_1lead>d</_1lead>" in text
        assert root is not None


# ------------- verdict #1: late exchange is the multi-node default --


def _events_table(n, base_off=0):
    return pa.table({
        "url": pa.array([f"https://x/{i % (n // 2)}" for i in range(n)]),
        "warc_ts": pa.array([1_000_000 + i for i in range(n)],
                            pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>hello</p>"] * n, pa.large_binary()),
        "lang": pa.array(["en"] * n),
        "offset": pa.array([base_off + i for i in range(n)], pa.int64()),
    })


def test_large_upsert_defaults_late_on_multinode(ray_session, tmp_path,
                                                 monkeypatch):
    """With no explicit exchange argument, a large upsert epoch must pick
    the late exchange when >1 Ray node is alive, and the sort exchange on
    one node — with identical manifests either way."""
    import ray.data

    import geomesa_nifi_ray.engine as eng_mod

    n = 400   # > 8 * batch_size(8) * P(2) = 128 -> "large" band

    # single node: sort stays the default
    eng1 = CDCEngine(str(tmp_path / "lake1"), num_buckets=2)
    monkeypatch.setattr(eng_mod, "_alive_node_count", lambda: 1)
    eng1.apply_epoch(ray.data.from_arrow(_events_table(n)), epoch=0,
                     offset_range=(0, n - 1), batch_size=8)
    assert eng1.last_exchange_strategy == "sort"

    # "multi-node": late becomes the default
    eng2 = CDCEngine(str(tmp_path / "lake2"), num_buckets=2)
    monkeypatch.setattr(eng_mod, "_alive_node_count", lambda: 2)
    eng2.apply_epoch(ray.data.from_arrow(_events_table(n)), epoch=0,
                     offset_range=(0, n - 1), batch_size=8)
    assert eng2.last_exchange_strategy == "late"

    # identical table state from either exchange
    s1 = eng1.table.snapshot_table().sort_by("url")
    s2 = eng2.table.snapshot_table().sort_by("url")
    assert s1.equals(s2)


def test_exchange_autoselect_respects_explicit_and_bands(ray_session,
                                                         tmp_path,
                                                         monkeypatch):
    import ray.data

    import geomesa_nifi_ray.engine as eng_mod

    monkeypatch.setattr(eng_mod, "_alive_node_count", lambda: 4)
    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    # tiny epoch stays on the single-task path even on multi-node
    eng.apply_epoch(ray.data.from_arrow(_events_table(8)), epoch=0,
                    offset_range=(0, 7), batch_size=8)
    assert eng.last_exchange_strategy == "tiny"
    # explicit sort wins over the multi-node default
    eng.apply_epoch(ray.data.from_arrow(_events_table(400, base_off=1000)),
                    epoch=1, offset_range=(1000, 1399), batch_size=8,
                    exchange="sort")
    assert eng.last_exchange_strategy == "sort"
    # update mode never takes the late exchange
    eng.apply_epoch(ray.data.from_arrow(_events_table(400, base_off=2000)),
                    epoch=2, offset_range=(2000, 2399), batch_size=8,
                    mode="update")
    assert eng.last_exchange_strategy in ("sort", "split")


# ----------------- round-4 verdict #4/#5: sampling kernels + layouts ---


def _doc_ds(n=3000):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"doc-{i:07d}" for i in range(n)]),
        "lang": pa.array((["en", "de", "fr", "pt", "nl"] * n)[:n]),
    }))


def test_bucket_from_hex_matches_reference(ray_session):
    """Vectorized nibble-LUT bucket == int(key[:4], 16) * B // 65536."""
    from geomesa_nifi_ray.sampling import _bucket_from_hex, _hash_col

    t = pa.table({"k": pa.array([f"v{i}" for i in range(500)])})
    keys = _hash_col(t, "k", "s0", "md5")
    got = _bucket_from_hex(keys, 64).to_pylist()
    want = [int(k[:4], 16) * 64 // 65536 for k in keys.to_pylist()]
    assert got == want
    # and for 16-char xx64 keys
    keys = _hash_col(t, "k", "s0", "xx64")
    got = _bucket_from_hex(keys, 32).to_pylist()
    want = [int(k[:4], 16) * 32 // 65536 for k in keys.to_pylist()]
    assert got == want


def test_shuffle_layouts_same_permutation(ray_session):
    """bucketed rows ordered by (_shuffle_bucket, shuffle_key) == the
    sorted layout's global permutation (bucket boundaries are key-prefix
    ranges), for both hash kernels."""
    from geomesa_nifi_ray.sampling import deterministic_shuffle

    for kernel in ("md5", "xx64"):
        b = deterministic_shuffle(_doc_ds(), "doc_id", kernel=kernel,
                                  layout="bucketed").to_pandas()
        s = deterministic_shuffle(_doc_ds(), "doc_id", kernel=kernel,
                                  layout="sorted").to_pandas()
        b2 = b.sort_values(["_shuffle_bucket", "shuffle_key"])
        assert list(b2["doc_id"]) == list(s["doc_id"])
        # sorting by key alone gives the same order: range-bucket property
        b3 = b.sort_values("shuffle_key")
        assert list(b3["doc_id"]) == list(s["doc_id"])


def test_shuffle_bucketed_does_not_leak_global_strategy(ray_session):
    from ray.data import DataContext

    from geomesa_nifi_ray.sampling import deterministic_shuffle

    before = DataContext.get_current().shuffle_strategy
    ds = deterministic_shuffle(_doc_ds(500), "doc_id", layout="bucketed")
    assert ds.count() == 500
    assert DataContext.get_current().shuffle_strategy == before


def test_shuffle_layout_never_auto_switches(ray_session):
    """The default layout is sorted on EVERY cluster shape: the layouts
    differ in observable output (order + a _shuffle_bucket column), so a
    cluster-shape auto-switch would reintroduce the cluster-size
    dependence the function exists to remove. Bucketed is explicit."""
    import geomesa_nifi_ray.sampling as samp

    cols = set(samp.deterministic_shuffle(_doc_ds(200), "doc_id")
               .schema().names)
    assert "_shuffle_bucket" not in cols
    cols = set(samp.deterministic_shuffle(_doc_ds(200), "doc_id",
                                          layout="bucketed").schema().names)
    assert "_shuffle_bucket" in cols
    with pytest.raises(ValueError, match="layout"):
        samp.deterministic_shuffle(_doc_ds(10), "doc_id",
                                   layout="auto").take_all()


def test_sampling_xx64_kernel_deterministic(ray_session):
    """xx64 sampling/cap runs vectorized and reselects identically."""
    from geomesa_nifi_ray.sampling import hash_sample, stratified_cap

    a = sorted(hash_sample(_doc_ds(), "doc_id", kernel="xx64")
               .to_pandas()["doc_id"])
    b = sorted(hash_sample(_doc_ds(), "doc_id", kernel="xx64")
               .to_pandas()["doc_id"])
    assert a == b and 0 < len(a) < 3000
    c1 = stratified_cap(_doc_ds(), "lang", "doc_id", cap=7, seed="s0",
                        kernel="xx64").to_pandas()
    c2 = stratified_cap(_doc_ds(), "lang", "doc_id", cap=7, seed="s0",
                        kernel="xx64").to_pandas()
    assert c1.groupby("lang").size().max() <= 7
    assert sorted(c1["doc_id"]) == sorted(c2["doc_id"])


def test_sampling_rejects_unknown_kernel(ray_session):
    from geomesa_nifi_ray.sampling import hash_sample

    with pytest.raises(ValueError, match="kernel"):
        hash_sample(_doc_ds(10), "doc_id", kernel="sha9").take_all()


# ----------------- round-4 verdict #8: contamination screen at scale ---


def test_contamination_alternation_equals_naive_loop(ray_session):
    """The single RE2 alternation must agree with the per-snippet
    match_substring loop on tricky content (regex metachars, newlines,
    tabs, unicode)."""
    import ray.data

    from geomesa_nifi_ray.textstats import ContaminationStage

    snippets = ["a.b*c", "line1\nline2", "tab\there", "naïve café",
                "(paren) [brack]", "x" * 40, "plain snippet"]
    texts = [
        "contains a.b*c here", "axbxc should NOT match", "no hit at all",
        "pre line1\nline2 post", "tab\there exact", "tab here spaced",
        "prefix naïve café suffix", "((paren) [brack])", "y" + "x" * 40,
        "x" * 39, None, "plain snippet",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})

    got = (ray.data.from_arrow(t)
           .map_batches(ContaminationStage(snippets), batch_format="pyarrow")
           .to_pandas().sort_values("doc_id")["contaminated"].tolist())
    want = []
    for tx in texts:
        want.append(bool(tx) and any(sn in tx for sn in snippets))
    assert got == want


def test_contamination_scales_with_rows_not_snippets(ray_session):
    """10^4-snippet blocklist: wall time must scale ~O(rows) (the DFA is
    snippet-count-independent), and a 10x bigger blocklist must not cost
    10x. Loose bounds — this guards the complexity class, not the host."""
    import time

    import ray.data

    from geomesa_nifi_ray.textstats import ContaminationStage

    rng = __import__("numpy").random.default_rng(7)
    snippets = ["".join(map(chr, rng.integers(97, 123, size=24)))
                for _ in range(10_000)]
    docs = ["".join(map(chr, rng.integers(97, 123, size=400)))
            for _ in range(2_000)]
    # plant a few hits
    docs[17] += snippets[3]
    docs[991] = snippets[777] + docs[991]

    def run(texts, snips):
        # min-of-3: the shared host's interference bursts inflate single
        # readings 2-10x (BASELINE.md "host interference"); only the
        # complexity class is under test, so take the best wall of each
        # config instead of trusting one reading
        walls = []
        for _ in range(3):
            t = pa.table({"doc_id": pa.array(range(len(texts)),
                                             type=pa.int64()),
                          "text": pa.array(texts, type=pa.string())})
            ds = ray.data.from_arrow(t).map_batches(
                ContaminationStage(snips), batch_format="pyarrow")
            t0 = time.perf_counter()
            out = ds.to_pandas()
            walls.append(time.perf_counter() - t0)
        return min(walls), int(out["contaminated"].sum())

    t_1x, hits = run(docs, snippets)
    assert hits == 2
    t_4x, _ = run(docs * 4, snippets)
    # O(rows): 4x rows should cost < 10x (noise headroom), not O(snips*rows)
    assert t_4x < 10 * max(t_1x, 0.1)


# ---------------- round-4 self-review fixes (code-review findings) -----


def test_gml_forbidden_unicode_column_names_parse():
    """U+00D7/U+2014 etc. are above U+00C0 but forbidden in XML names; the
    sanitizer must use real NameChar ranges, not a blanket allowance."""
    import xml.etree.ElementTree as ET

    from geomesa_nifi_ray.export import _encode_gml

    t = pa.table({"size×width": pa.array([1]), "a—b": pa.array([2]),
                  "café": pa.array([3]), "9lead": pa.array([4]),
                  "a b:c": pa.array([5])})
    for version in ("gml", "gml2"):
        ET.fromstring(_encode_gml(t, version))  # must be well-formed


def test_z3_null_timestamp_rows_drop_not_crash():
    import pyarrow.compute as pc

    from geomesa_nifi_ray.geometry import WEEK_US, bbox_filter, z3_bbox_time_filter, z3_encode

    t = pa.table({
        "id": pa.array([0, 1, 2], type=pa.int64()),
        "lon": pa.array([10.0, 11.0, 12.0]),
        "lat": pa.array([5.0, 6.0, 7.0]),
        "ts": pa.array([WEEK_US + 5, None, WEEK_US + 9], type=pa.int64()),
    })
    got = z3_bbox_time_filter(t, "lon", "lat", "ts", (0.0, 0.0, 20.0, 20.0),
                              WEEK_US, 2 * WEEK_US)
    assert got["id"].to_pylist() == [0, 2]  # null ts drops, like the oracle
    b, z = z3_encode(t["lon"], t["lat"], t["ts"])
    assert b.null_count == 1 and z.null_count == 1
    # null coords -> null z2/z3 keys too
    from geomesa_nifi_ray.geometry import z2_encode
    z2 = z2_encode(pa.array([1.0, None]), pa.array([None, 2.0]))
    assert z2.null_count == 2


def test_wkb_null_coordinates_roundtrip_null():
    from geomesa_nifi_ray.geometry import parse_wkb_point, wkb_point

    w = wkb_point(pa.array([1.0, None, 3.0]), pa.array([2.0, 5.0, None]))
    assert w.null_count == 2 and len(w[0].as_py()) == 21
    x, y = parse_wkb_point(w)
    assert x.to_pylist() == [1.0, None, None]
    assert y.to_pylist() == [2.0, None, None]


def test_contamination_accepts_iterator_blocklist(ray_session):
    import ray.data

    from geomesa_nifi_ray.textstats import ContaminationStage

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["has badsnippet inside", "clean"])})
    got = (ray.data.from_arrow(t)
           .map_batches(ContaminationStage(iter(["badsnippet"])),
                        batch_format="pyarrow")
           .to_pandas().sort_values("doc_id")["contaminated"].tolist())
    assert got == [True, False]


def test_pipelined_replay_honors_explicit_lookahead(tmp_path, ray_session,
                                                    monkeypatch):
    """An explicit lookahead=1 must reach the raw-task path as window=1
    (the documented bound on live converted epochs), not be floored to 8."""
    from geomesa_nifi_ray import engine as eng_mod
    from geomesa_nifi_ray.synth import BinlogSpec, write_binlog

    meta = write_binlog(str(tmp_path / "binlog"),
                        BinlogSpec(num_events=600, num_urls=120, num_epochs=2))
    eng = eng_mod.CDCEngine(str(tmp_path / "lake"), num_buckets=4)
    seen = {}
    orig = eng_mod.CDCEngine._replay_raw_tasks

    def spy(self, plans, timeline, mode, batch_size, window, **kw):
        seen["window"] = window
        return orig(self, plans, timeline, mode, batch_size,
                    window=window, **kw)

    monkeypatch.setattr(eng_mod.CDCEngine, "_replay_raw_tasks", spy)
    eng.replay_binlog(meta, catchup=False, lookahead=1)
    assert seen.get("window") == 1


# ----------------- round-5: deterministic train/val/test split --------------

def test_hash_split_deterministic_and_partition_invariant(ray_session):
    """hash_split: labels are a pure function of (seed, kernel, key) —
    identical across repartitioning, fractions honored within the 4-hex
    quantization tolerance, every row labeled."""
    from geomesa_nifi_ray.sampling import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(_doc_ds(2000), "doc_id", fr).to_pandas()
    b = hash_split(_doc_ds(2000).repartition(17), "doc_id", fr).to_pandas()
    am = a.set_index("doc_id")["split"].sort_index()
    bm = b.set_index("doc_id")["split"].sort_index()
    assert am.equals(bm)
    counts = a["split"].value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.05
    assert set(a["split"]) == {"train", "val", "test"}
    # xx64 kernel path is deterministic too (different assignment, same
    # reproducibility)
    x1 = hash_split(_doc_ds(500), "doc_id", fr, kernel="xx64").to_pandas()
    x2 = hash_split(_doc_ds(500).repartition(7), "doc_id", fr,
                    kernel="xx64").to_pandas()
    assert x1.set_index("doc_id")["split"].sort_index().equals(
        x2.set_index("doc_id")["split"].sort_index())


def test_hash_split_validates_fractions(ray_session):
    from geomesa_nifi_ray.sampling import hash_split

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(_doc_ds(10), "doc_id", {"a": 0.5, "b": 0.4}).take_all()
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(_doc_ds(10), "doc_id", {"a": 1.5, "b": -0.5}).take_all()


def test_hash_split_edge_and_null_semantics(ray_session):
    """Review-fix edges: (1) an interior edge that quantizes to the full
    keyspace renders as SQL 'g000' (above every 4-hex prefix — a naive
    '10000' string-compares BELOW most prefixes and inverts the split)
    while hash_split labels every row with the first label; (2) null keys
    take the LAST label on both sides (the SQL CASE chain's NULL
    comparisons fall through to ELSE)."""
    import ray.data

    from geomesa_nifi_ray.sampling import hash_split, split_edges_hex

    fr = {"a": 0.999995, "b": 0.000005}
    assert split_edges_hex(fr) == ["g000"]
    out = hash_split(_doc_ds(300), "doc_id", fr).to_pandas()
    assert set(out["split"]) == {"a"}
    # every 4-hex md5 prefix string-compares below 'g000' (the SQL arm)
    assert "ffff" < "g000" and "0000" < "g000"

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, None, 2], pa.int64())}))
    out = hash_split(ds, "doc_id", {"train": 0.5, "test": 0.5}).to_pandas()
    assert out.loc[out["doc_id"].isna(), "split"].tolist() == ["test"]


def test_host_count_partial_unmatched_urls(ray_session):
    """Unmatched urls land in the '' host group with their true count
    (not a dropped null group) — matching DuckDB's regexp_extract."""
    from geomesa_nifi_ray.pipelines.queries import _host_count_partial

    t = pa.table({"url": pa.array(
        ["https://h1/x", "ftp://weird/y", "not-a-url", "http://h1/z"])})
    out = _host_count_partial(t).to_pandas().set_index("host")["n"]
    assert out[""] == 2 and out["h1"] == 2

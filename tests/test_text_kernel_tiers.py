"""Differential corpus: the per-row loop and the Arrow-RE2 vectorized
implementation of the extract kernel must be byte-identical on every
payload shape — including the pathological cases where regex-engine
semantics could diverge (backref close-tag pairing vs two-branch
alternation, invalid UTF-8 inside stripped regions, entity edge cases,
unicode whitespace). Also pins the auto-selection thresholds and the
mixed-kernel lake rejection (TEXT_KERNEL_VERSION enforcement)."""

import pyarrow as pa
import pytest

from geomesa_nifi_ray.text import (
    VECTORIZED_MIN_MEAN_BYTES,
    extract_text,
    extract_text_batch,
    extract_text_batch_vectorized,
)

CORPUS = [
    None,
    b"",
    b"plain text no tags",
    b"<p>hello <b>world</b></p>",
    b"<script>var x = '<p>not text</p>';</script>real",
    b"<SCRIPT TYPE='x'>upper</SCRIPT>kept",
    b"<style>.a{color:red}</style><p>ok</p>",
    # pathological interleaving: close tags of the OTHER kind inside
    b"<style>x<script>y</style>z</script>",
    b"<script>a</style>b</script><style>c</script>d</style>",
    b"<script>never closed <p>swallowed?",
    b"<!-- comment with <p>tags</p> inside -->after",
    b"<!-- unclosed comment <p>x",
    # entities (named, numeric, bare &, double-escaped)
    b"a &amp; b &lt;tag&gt; &#65; &#x42; &nosuch; &amp;amp;",
    # invalid utf-8 inside AND outside stripped regions
    b"<script>\xff\xfe</script>ok\xf0\x9f bad",
    b"\xff<i>y</i>\xfe",
    # multi-byte utf-8 straddling tags, unicode whitespace (U+00A0, U+2028)
    "<p>café</p> naïve line".encode(),
    # whitespace runs, newlines-in-tags, empty lines
    b"a\n\n\n  b\t\tc   <br>\nd",
    b"< notatag but has space>text< / p >",
    # attribute with '>' lookalike handled per v1 semantics
    b'<a href="x" title="a>b">link</a>',
    # script tag with attributes and mixed case close
    b"<script src='x.js' async>code();</ScRiPt >tail",
]


def test_differential_corpus_byte_identical():
    col = pa.array(CORPUS, type=pa.large_binary())
    loop = extract_text_batch(col, implementation="loop")
    vec = extract_text_batch_vectorized(col)
    for i, (a, b) in enumerate(zip(loop.to_pylist(), vec.to_pylist())):
        assert a == b, f"corpus[{i}] diverged: loop={a!r} vec={b!r}"


def test_differential_large_docs_byte_identical():
    """>=100 KB synthetic docs: heavy markup, big script payloads, long
    entity-dense text, repeated comment blocks."""
    page = (b"<div class='x'><p>Some text &amp; more</p>"
            b"<script>var a='" + b"z" * 500 + b"';</script>"
            b"<!-- c -->" + "unicode café   ".encode() * 20
            + b"</div>\n")
    big1 = page * 400                       # ~400 KB markup-heavy
    big2 = b"<style>" + b"s" * 200_000 + b"</style>rest"   # one huge block
    big3 = (b"text &lt;x&gt; " * 30_000)     # entity-dense, tag-free
    col = pa.array([big1, big2, big3], type=pa.large_binary())
    loop = extract_text_batch(col, implementation="loop")
    vec = extract_text_batch_vectorized(col)
    assert loop.to_pylist() == vec.to_pylist()


def test_single_row_matches_batch():
    col = pa.array(CORPUS, type=pa.large_binary())
    per_row = [None if v is None else extract_text(v) for v in CORPUS]
    assert extract_text_batch(col).to_pylist() == per_row


def test_auto_selects_by_mean_payload():
    small = pa.array([b"<p>x</p>"] * 8, type=pa.large_binary())
    big = pa.array([b"<p>" + b"y" * (2 * VECTORIZED_MIN_MEAN_BYTES) + b"</p>"],
                   type=pa.large_binary())
    # both paths must work through the auto surface and equal the loop
    assert (extract_text_batch(small, "auto").to_pylist()
            == extract_text_batch(small, "loop").to_pylist())
    assert (extract_text_batch(big, "auto").to_pylist()
            == extract_text_batch(big, "loop").to_pylist())


def test_mixed_kernel_lake_rejected(ray_session, tmp_path, monkeypatch):
    """A lake whose committed epochs were written under a different
    TEXT_KERNEL_VERSION must refuse further appends: replaying under a
    changed kernel silently mixes two text definitions in one table. The
    gate runs once per engine instance — the threat model is a NEW binary
    (new engine instance) opening an old lake, so each phase below uses a
    fresh instance, as a restarted process would."""
    import ray.data

    import geomesa_nifi_ray.engine as engine_mod
    from geomesa_nifi_ray.engine import CDCEngine, SchemaError

    eng = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    t = pa.table({
        "url": pa.array(["https://x/1"]),
        "warc_ts": pa.array([1_000_000], pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<p>a</p>"], pa.large_binary()),
        "lang": pa.array(["en"]),
        "offset": pa.array([0], pa.int64()),
    })
    eng.apply_epoch(ray.data.from_arrow(t), epoch=0, offset_range=(0, 0))

    # "upgraded binary" opens the same lake
    monkeypatch.setattr(engine_mod, "TEXT_KERNEL_VERSION", "extract-v99")
    eng2 = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    t2 = t.set_column(4, "offset", pa.array([1], pa.int64()))
    with pytest.raises(SchemaError, match="kernel"):
        eng2.apply_epoch(ray.data.from_arrow(t2), epoch=1,
                         offset_range=(1, 1))

    # truncate under the new kernel empties the table and re-opens appends
    # (a clear tip is never mixed), even from yet another fresh instance
    eng2.truncate()
    eng3 = CDCEngine(str(tmp_path / "lake"), num_buckets=2)
    res = eng3.apply_epoch(ray.data.from_arrow(t2), epoch=2,
                           offset_range=(1, 1))
    assert res is not None and res.rows_applied == 1


def test_mixed_kernel_gate_skips_generic_tables(ray_session, tmp_path,
                                                monkeypatch):
    """Generic lakes (no kernel-derived html->text columns) must keep
    accepting appends across kernel version bumps — they stamp the version
    for provenance only."""
    import ray.data

    import geomesa_nifi_ray.engine as engine_mod
    from geomesa_nifi_ray.engine import CDCEngine, make_generic_convert_fn

    schema = pa.schema([
        pa.field("k", pa.string()), pa.field("v", pa.int64()),
        pa.field("content_hash", pa.string()), pa.field("offset", pa.int64()),
    ])
    eng = CDCEngine(str(tmp_path / "kv"), table_name="kv", schema=schema,
                    num_buckets=2, key="k", order=("offset",),
                    convert_fn_factory=make_generic_convert_fn)
    t = pa.table({"k": ["a"], "v": pa.array([1], pa.int64()),
                  "offset": pa.array([0], pa.int64())})
    eng.apply_epoch(ray.data.from_arrow(t), epoch=0, offset_range=(0, 0))

    monkeypatch.setattr(engine_mod, "TEXT_KERNEL_VERSION", "extract-v99")
    eng2 = CDCEngine(str(tmp_path / "kv"), table_name="kv", schema=schema,
                     num_buckets=2, key="k", order=("offset",),
                     convert_fn_factory=make_generic_convert_fn)
    t2 = pa.table({"k": ["b"], "v": pa.array([2], pa.int64()),
                   "offset": pa.array([1], pa.int64())})
    res = eng2.apply_epoch(ray.data.from_arrow(t2), epoch=1,
                           offset_range=(1, 1))
    assert res is not None and res.rows_applied == 1


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _FRAGS = st.sampled_from([
        b"<script>", b"</script>", b"<style>", b"</style >", b"<SCRIPT a>",
        b"</ScRiPt>", b"<!--", b"-->", b"<p>", b"</p>", b"<", b">", b"&amp;",
        b"&#65;", b"&", b" ", b"\n", b"\t", b"text", b"caf\xc3\xa9",
        b"\xff", b"\xf0\x9f", b"z" * 50,
    ])

    @given(st.lists(_FRAGS, min_size=0, max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_fuzz_loop_equals_vectorized(frags):
        payload = b"".join(frags)
        col = pa.array([payload], type=pa.large_binary())
        assert (extract_text_batch(col, "loop").to_pylist()
                == extract_text_batch_vectorized(col).to_pylist())
except ImportError:  # pragma: no cover
    pass

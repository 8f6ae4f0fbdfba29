"""Property-based tests (hypothesis) for the merge/schema kernels —
stronger than the reference's example-based-only strategy (SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from geomesa_nifi_ray.schema import CompatibilityMode, merge_schemas, project_to_schema
from geomesa_nifi_ray.upsert import lww_dedupe, merge_upsert

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 20),            # key id
        st.integers(0, 50),            # ts
        st.text(alphabet="abc", max_size=4),
    ),
    min_size=1,
    max_size=200,
)


def _tbl(rows):
    return pa.table(
        {
            "url": pa.array([f"u{k}" for k, _, _ in rows]),
            "warc_ts": pa.array([t for _, t, _ in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "offset": pa.array(np.arange(len(rows), dtype=np.int64)),
            "val": pa.array([v for _, _, v in rows]),
        }
    )


@given(rows_strategy)
@settings(max_examples=50, deadline=None)
def test_lww_matches_pandas_oracle(rows):
    t = _tbl(rows)
    ours = lww_dedupe(t, "url", ["warc_ts", "offset"]).to_pandas()
    df = t.to_pandas()
    expected = (
        df.sort_values(["warc_ts", "offset"], kind="stable")
        .groupby("url", as_index=False)
        .last()
    )
    ours = ours.sort_values("url").reset_index(drop=True)
    expected = expected.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ours[["url", "val"]], expected[["url", "val"]], check_dtype=False
    )


@given(rows_strategy, st.integers(1, 5))
@settings(max_examples=30, deadline=None)
def test_batched_lww_associative(rows, n_splits):
    """Applying LWW over arbitrary splits then merging equals one-shot LWW —
    the property the catch-up replay batching relies on."""
    t = _tbl(rows)
    one_shot = lww_dedupe(t, "url", ["warc_ts", "offset"])
    # split into n chunks, LWW each, then merge_upsert left-to-right
    n = t.num_rows
    per = max(1, n // n_splits)
    acc = None
    for lo in range(0, n, per):
        chunk = lww_dedupe(t.slice(lo, min(per, n - lo)), "url", ["warc_ts", "offset"])
        acc = merge_upsert(acc, chunk, "url", ["warc_ts", "offset"])
    a = one_shot.to_pandas().sort_values("url").reset_index(drop=True)
    b = acc.to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


_types = st.sampled_from(["int32", "int64", "float64", "string"])
_names = st.lists(st.sampled_from(list("abcdef")), unique=True, min_size=1, max_size=6)


@given(_names, _names)
@settings(max_examples=50, deadline=None)
def test_update_merge_is_superset_and_projection_total(stored_names, incoming_names):
    import pyarrow as pa

    stored = pa.schema([pa.field(n, pa.string()) for n in stored_names])
    incoming = pa.schema([pa.field(n, pa.string()) for n in incoming_names])
    r = merge_schemas(stored, incoming, CompatibilityMode.UPDATE)
    assert set(stored.names) <= set(r.schema.names)          # never removes
    assert set(incoming.names) <= set(r.schema.names)        # additive
    # projection to the merged schema is total for any input subset
    t = pa.table({n: ["x"] for n in incoming_names})
    out = project_to_schema(t, r.schema)
    assert out.schema.names == r.schema.names and out.num_rows == 1


# ---- round-2 kernels -------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=200),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_rolling_window_hash_matches_naive(vals, k):
    """Vectorized prefix-trick window hash == naive per-window recompute."""
    from geomesa_nifi_ray.text import _POLY_BASE, rolling_window_hashes

    arr = np.array(vals, dtype=np.uint64)
    got = rolling_window_hashes(arr, k)

    def naive_window(window):
        h = np.uint64(0)
        p = np.uint64(1)
        with np.errstate(over="ignore"):
            for v in window:
                h = h + np.uint64(v) * p
                p = p * _POLY_BASE
        return h

    if len(arr) == 0:
        assert got.tolist() == [0]
    elif len(arr) <= k:
        assert got.tolist() == [int(naive_window(arr))]
    else:
        want = [int(naive_window(arr[i : i + k])) for i in range(len(arr) - k + 1)]
        assert got.tolist() == want


@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5), st.integers(-5, 5),
                  st.integers(-5, 5)),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=60, deadline=None)
def test_lex_ge_matches_tuple_compare(rows):
    from geomesa_nifi_ray.upsert import lex_ge

    a1 = np.array([r[0] for r in rows]); a2 = np.array([r[1] for r in rows])
    b1 = np.array([r[2] for r in rows]); b2 = np.array([r[3] for r in rows])
    got = lex_ge([a1, a2], [b1, b2])
    want = [(x1, x2) >= (y1, y2) for x1, x2, y1, y2 in rows]
    assert got.tolist() == want


@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=8)),
            st.one_of(st.none(), st.integers(-2**40, 2**40)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                           width=32)),
            st.one_of(st.none(), st.binary(max_size=16)),
            st.one_of(st.none(), st.lists(st.text(max_size=4), max_size=3)),
        ),
        min_size=0, max_size=30,
    )
)
@settings(max_examples=40, deadline=None)
def test_avro_roundtrip_property(rows):
    """Arbitrary nullable scalar/list rows survive the Avro codec exactly."""
    import os
    import tempfile

    from geomesa_nifi_ray.avro_io import read_avro, write_avro

    t = pa.table(
        {
            "s": pa.array([r[0] for r in rows], type=pa.string()),
            "i": pa.array([r[1] for r in rows], type=pa.int64()),
            "f": pa.array([r[2] for r in rows], type=pa.float32()),
            "b": pa.array([r[3] for r in rows], type=pa.binary()),
            "l": pa.array([r[4] for r in rows], type=pa.list_(pa.string())),
        }
    )
    fd, path = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        write_avro(t, path)
        back = read_avro(path)
        assert back.num_rows == t.num_rows
        for c in t.column_names:
            assert back[c].to_pylist() == t[c].to_pylist(), c
    finally:
        os.unlink(path)


# ----------------------------------------------------------------- geometry

_coord = st.floats(min_value=-180.0, max_value=180.0,
                   allow_nan=False, allow_infinity=False)
_lat = st.floats(min_value=-90.0, max_value=90.0,
                 allow_nan=False, allow_infinity=False)
# query boxes may straddle or sit outside the curve domain
_boxx = st.floats(min_value=-200.0, max_value=200.0,
                  allow_nan=False, allow_infinity=False)
_boxy = st.floats(min_value=-100.0, max_value=100.0,
                  allow_nan=False, allow_infinity=False)


@given(
    st.lists(st.tuples(_coord, _lat), min_size=1, max_size=200),
    st.tuples(_boxx, _boxy, _boxx, _boxy),
    st.integers(2, 12),
    st.integers(4, 64),
)
@example(pts=[(-2.4936453002416264e-206, 0.0)], box=(0.0, 1.0, -1.0, 0.0),
         bits=2, max_ranges=4)  # float rounding pushed the point a cell up
@example(pts=[(180.0, 90.0)], box=(179.0, 89.0, 200.0, 100.0),
         bits=4, max_ranges=8)  # domain-edge point, box leaves the domain
@settings(max_examples=120, deadline=None)
def test_z2_cover_refine_equals_exact_bbox(pts, box, bits, max_ranges):
    """For ANY bbox / curve resolution / range budget, the covering-range
    scan + exact refine must equal the plain bbox predicate (losslessness
    of GeoMesa's index-scan strategy, the core invariant)."""
    from geomesa_nifi_ray.geometry import bbox_filter, z2_bbox_filter

    x0, y0, x1, y1 = box
    bbox = (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
    t = pa.table({
        "id": pa.array(range(len(pts)), type=pa.int64()),
        "lon": pa.array([p[0] for p in pts], type=pa.float64()),
        "lat": pa.array([p[1] for p in pts], type=pa.float64()),
    })
    exact = bbox_filter(t, "lon", "lat", bbox)
    indexed = z2_bbox_filter(t, "lon", "lat", bbox,
                             bits=bits, max_ranges=max_ranges)
    assert indexed["id"].to_pylist() == exact["id"].to_pylist()


@given(st.lists(st.tuples(_coord, _lat), min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_wkb_roundtrip_property(pts):
    from geomesa_nifi_ray.geometry import parse_wkb_point, wkb_point

    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    x, y = parse_wkb_point(wkb_point(lon, lat))
    assert (x.to_numpy() == lon).all() and (y.to_numpy() == lat).all()


# URL-ish strings biased toward the normalization rule's trigger chars;
# plus full unicode to probe Arrow-RE2 vs DuckDB-RE2 lowering parity
_url_chars = st.sampled_from(list("aZ9+-.:/?#@%\x1f") + ["\u0130", "\u00df", "\u03a3"])
_url_strings = st.one_of(
    st.text(_url_chars, max_size=24),
    st.text(max_size=16),  # arbitrary unicode
)


@given(st.lists(_url_strings, min_size=1, max_size=20))
@settings(max_examples=120, deadline=None)
@example(["https://H/p??", "HTTP://A@B.C:1/?#", "x://#", "://y", "?#"])
def test_normalize_urls_matches_duckdb_rendering(urls):
    """The vectorized kernel and the production oracle SQL must agree on
    ARBITRARY strings, not just well-formed URLs — the cdc_replay_norm_keys
    correctness gate compares them over whatever bytes a crawl emits."""
    import duckdb

    from geomesa_nifi_ray.pipelines.queries import (
        _URL_NORM_CASE_SQL,
        _URL_NORM_U2_SQL,
    )
    from geomesa_nifi_ray.text import normalize_urls

    got = normalize_urls(pa.array(urls, pa.string())).to_pylist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
    sql = ("SELECT " + _URL_NORM_CASE_SQL + " FROM (SELECT i, "
           + _URL_NORM_U2_SQL.replace("URLCOL", "u")
           + " AS u2 FROM t) ORDER BY i")
    want = [r[0] for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want

"""Property-based tests (hypothesis) for the merge/schema kernels —
stronger than the reference's example-based-only strategy (SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
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

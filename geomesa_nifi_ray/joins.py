"""Join operators Ray Data lacks, composed from groupby/map_groups.

The reference itself has no relational join (its join-analog is the keyed
store lookup, SURVEY §2.4), but large-scale event pipelines need the
time-ordered variants; implemented here as compositions the north star
prescribes: co-partition by key with ONE groupby, order-aware merge
inside the group — no driver-side materialization.

- :func:`asof_join` — for each left row, the most recent right row with
  ``right.on <= left.on`` within the same ``by`` key (DuckDB's ASOF JOIN,
  pandas' merge_asof). Implementation: tag + union both sides (a cheap
  metadata union, no shuffle), one ``groupby(by)``, and a vectorized
  searchsorted inside each group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left_ds, right_ds, *, by: str, on: str,
              value_cols: list[str], suffix: str = "_right",
              tiebreak: str | None = None):
    """Left as-of join: append ``value_cols`` (renamed with ``suffix``) from
    the latest right row at-or-before each left row's ``on`` time, matched
    within ``by``. Unmatched left rows get nulls.

    Ties on ``on``: pass ``tiebreak`` (a numeric/timestamp right-side
    column, e.g. a binlog offset) and the right row with the LARGEST
    tiebreak wins — deterministic across runs and block layouts. Without
    it, ties fall back to the physically-last right row within the group,
    which Ray Data does NOT guarantee stable across runs; only rely on
    that when right-side ``(by, on)`` is unique.
    """
    import ray.data  # noqa: F401  (callers own the session)

    # build the unified schema from the inputs' schemas (no data read)
    lschema = pa.schema(left_ds.schema().base_schema)
    rschema = pa.schema(right_ds.schema().base_schema)

    carry_cols = list(value_cols)
    if tiebreak is not None and tiebreak not in carry_cols:
        carry_cols.append(tiebreak)
    unified = pa.schema(
        list(lschema)
        + [pa.field(f"_r_{c}", rschema.field(c).type) for c in carry_cols]
        + [pa.field("_src", pa.int8())]
    )

    def tag(src: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = []
            for f in unified:
                if f.name == "_src":
                    cols.append(pa.array(np.full(t.num_rows, src, dtype=np.int8)))
                elif f.name.startswith("_r_"):
                    rc = f.name[3:]
                    if src == 1:
                        cols.append(pc.cast(t[rc].combine_chunks()
                                            if isinstance(t[rc], pa.ChunkedArray) else t[rc],
                                            f.type))
                    else:
                        cols.append(pa.nulls(t.num_rows, type=f.type))
                elif f.name in t.column_names:
                    col = t[f.name]
                    cols.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
                else:
                    cols.append(pa.nulls(t.num_rows, type=f.type))
            return pa.Table.from_arrays(cols, schema=unified)
        return fn

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    out_cols = [f.name for f in lschema] + [f"{c}{suffix}" for c in value_cols]

    def merge(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["_src"], pa.scalar(0, pa.int8()))
        left = g.filter(lmask)
        right = g.filter(pc.invert(lmask))
        if left.num_rows == 0:
            return pa.schema(
                [lschema.field(n) if n in lschema.names
                 else pa.field(n, rschema.field(n[: -len(suffix)]).type)
                 for n in out_cols]
            ).empty_table()
        l_on = pc.cast(left[on], pa.int64()).to_numpy(zero_copy_only=False)
        arrays = [left[f.name] for f in lschema]
        if right.num_rows == 0:
            for c in value_cols:
                arrays.append(pa.nulls(left.num_rows, type=rschema.field(c).type))
        else:
            r_on = pc.cast(right[on], pa.int64()).to_numpy(zero_copy_only=False)
            if tiebreak is not None:
                r_tb = pc.cast(right[f"_r_{tiebreak}"], pa.int64()).to_numpy(
                    zero_copy_only=False)
                # primary key r_on, secondary r_tb: within an exact-ts tie
                # the largest tiebreak sorts last, and side="right"-1 below
                # picks the last row of the tie run.
                order = np.lexsort((r_tb, r_on))
            else:
                order = np.argsort(r_on, kind="stable")
            r_on_sorted = r_on[order]
            pos = np.searchsorted(r_on_sorted, l_on, side="right") - 1
            have = pos >= 0
            safe = np.where(have, pos, 0)
            take = pa.array(order[safe].astype(np.int64))
            null_mask = pa.array(~have)
            for c in value_cols:
                vals = right[f"_r_{c}"].take(take)
                if isinstance(vals, pa.ChunkedArray):
                    vals = vals.combine_chunks()
                arrays.append(pc.if_else(null_mask,
                                         pa.nulls(left.num_rows, type=vals.type), vals))
        arrays = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays]
        return pa.Table.from_arrays(arrays, names=out_cols)

    return tagged.groupby(by).map_groups(merge, batch_format="pyarrow")

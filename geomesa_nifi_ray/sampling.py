"""Deterministic sampling / shuffling operators for training-data pipelines.

SURVEY §2.6: the reference has no sort/limit/sample operators (NiFi flows
process files; the keyed store absorbs ordering) — but a training-data
pipeline needs them, and at 100 TB they must be DETERMINISTIC and
cluster-size-independent: resuming a sampled export, or re-running a
shuffle on a different node count, must select/order the exact same rows.
Python's `random`, Ray's `random_shuffle()` and `ds.random_sample()` give
none of that; hashing does.

All three operators key on ``md5(cast(col as string))`` — embarrassingly
parallel per batch, reproducible in DuckDB SQL (the oracle checks them
exactly), and stable under any partitioning:

- :func:`hash_sample` — keep rows whose hex digest sorts below a
  threshold prefix (rate = threshold/16^k); a per-batch filter, no
  shuffle, no coordination.
- :func:`deterministic_shuffle` — a seeded total order: sort by
  ``md5(seed || key)``. Same seed -> same permutation on any cluster.
- :func:`stratified_cap` — at most N rows per group (cap docs per
  domain/language — the classic training-mix lever), chosen by the same
  hash order so the selection is stable, one groupby shuffle.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _md5_col(batch: pa.Table, col: str, seed: str = "") -> pa.Array:
    vals = pc.cast(batch[col], pa.string()).to_pylist()
    return pa.array(
        [hashlib.md5((seed + (v or "")).encode()).hexdigest() for v in vals],
        type=pa.string(),
    )


def hash_sample(ds, col: str, threshold: str = "28"):
    """Deterministic sample: keep rows with ``md5(col) < threshold`` (hex
    prefix compare; '28' ≈ 40/256 ≈ 15.6%). Pure per-batch filter."""

    def stage(t: pa.Table) -> pa.Table:
        h = _md5_col(t, col)
        return t.filter(pc.less(h, pa.scalar(threshold)))

    return ds.map_batches(stage, batch_format="pyarrow")


def deterministic_shuffle(ds, col: str, seed: str = "s0",
                          key_col: str = "shuffle_key"):
    """Seeded deterministic global shuffle: append ``md5(seed || col)`` and
    sort by it — the same permutation at any parallelism (unlike
    ``ds.random_shuffle``). The key column stays in the output so the
    order is verifiable downstream."""

    def stage(t: pa.Table) -> pa.Table:
        return t.append_column(key_col, _md5_col(t, col, seed))

    return ds.map_batches(stage, batch_format="pyarrow").sort(key_col)


def stratified_cap(ds, group_col: str, col: str, cap: int, seed: str = "s0"):
    """At most ``cap`` rows per group, selected by the seeded hash order
    (stable under resharding): the per-domain / per-language quota of a
    training mix. One groupby exchange; selection inside the group is a
    vectorized sort-head."""

    def stage(t: pa.Table) -> pa.Table:
        return t.append_column("_sk", _md5_col(t, col, seed))

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("_sk").head(cap).drop(columns=["_sk"])

    return (
        ds.map_batches(stage, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(head, batch_format="pandas")
    )

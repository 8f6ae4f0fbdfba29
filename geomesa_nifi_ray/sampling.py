"""Deterministic sampling / shuffling operators for training-data pipelines.

SURVEY §2.6: the reference has no sort/limit/sample operators (NiFi flows
process files; the keyed store absorbs ordering) — but a training-data
pipeline needs them, and at 100 TB they must be DETERMINISTIC and
cluster-size-independent: resuming a sampled export, or re-running a
shuffle on a different node count, must select/order the exact same rows.
Python's `random`, Ray's `random_shuffle()` and `ds.random_sample()` give
none of that; hashing does.

All three operators key on a seeded hash of a column, embarrassingly
parallel per batch and stable under any partitioning:

- :func:`hash_sample` — keep rows whose hex digest sorts below a
  threshold prefix (rate = threshold/16^k); a per-batch filter, no
  shuffle, no coordination.
- :func:`deterministic_shuffle` — a seeded permutation keyed by
  ``hash(seed || key)``. Same seed -> same permutation on any cluster.
  Two physical layouts, chosen EXPLICITLY (the observable output —
  stream order + a ``_shuffle_bucket`` column — differs between them, so
  nothing may auto-switch by cluster shape): ``sorted`` (default
  everywhere; a global total-order sort) and ``bucketed`` (the scale
  opt-in; one static-boundary hash exchange, no total-order sort)
  which range-buckets keys on their first 4 hex nibbles and sorts each
  bucket internally — concatenating buckets in ``_shuffle_bucket``
  order reproduces the exact global permutation of ``sorted``. The
  oracle checks the key set, identical under both layouts.
- :func:`stratified_cap` — at most N rows per group (cap docs per
  domain/language — the classic training-mix lever), chosen by the same
  hash order so the selection is stable, one groupby shuffle.

Hash kernels (mirrors ``hashing.py``'s per-table kernel selection):
``md5`` (default) is DuckDB-oracle-reproducible (`md5(seed || col)`) but
per-row C md5 (~2.6 us/row); ``xx64`` is the vectorized scale kernel
(polars Rust hash + numpy hex, ~1.5 us/row, no per-row Python) for lakes
that already opted into xx64 content hashes. Both produce uniform hex
keys, so thresholds/permutations have identical semantics; only the
concrete row selection/order differs by kernel (as it does by seed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SAMPLING_KERNELS = ("md5", "xx64")

# inverse hex LUT: ascii byte -> nibble value (only [0-9a-f] appear)
_UNHEX = np.zeros(256, dtype=np.uint32)
for _i, _c in enumerate(b"0123456789abcdef"):
    _UNHEX[_c] = _i


def _hash_col(batch: pa.Table, col: str, seed: str = "",
              kernel: str = "md5") -> pa.Array:
    """``hash(seed || cast(col as string))`` as a hex-string array.
    md5 = per-row C md5, 32 hex chars, SQL-reproducible. xx64 = polars'
    vectorized 64-bit hash + numpy hex encode, 16 hex chars."""
    _check_kernel(kernel)
    vals = pc.fill_null(pc.cast(batch[col], pa.string()), "")
    if kernel == "xx64":
        from geomesa_nifi_ray.hashing import content_hash_generic

        if seed:
            vals = pc.binary_join_element_wise(
                pa.scalar(seed), vals, pa.scalar(""))
        return content_hash_generic(pa.table({"v": vals}), ["v"],
                                    kernel="xx64")
    return pa.array(
        [hashlib.md5((seed + v).encode()).hexdigest()
         for v in vals.to_pylist()],
        type=pa.string(),
    )


def _hex4_to_uint(keys: pa.Array) -> np.ndarray:
    """First 4 hex nibbles of each key as a uint64 array in [0, 65535].
    Fully vectorized via a numpy nibble LUT over the raw string buffers."""
    prefix = pc.utf8_slice_codeunits(keys, 0, 4)
    if isinstance(prefix, pa.ChunkedArray):
        prefix = prefix.combine_chunks()
    b = prefix.cast(pa.binary())
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(b.buffers()[1], dtype=np.int32)[
        b.offset: b.offset + len(b) + 1]
    raw = data[offs[:-1, None] + np.arange(4)]
    nib = _UNHEX[raw]
    return ((nib[:, 0] << 12) | (nib[:, 1] << 8)
            | (nib[:, 2] << 4) | nib[:, 3]).astype(np.uint64)


def _bucket_from_hex(keys: pa.Array, num_buckets: int) -> pa.Array:
    """Range bucket from the first 4 hex nibbles of each key:
    ``floor(int(key[:4], 16) * B / 65536)``. Static boundaries (keys are
    uniform hashes), so bucket i's keys all sort before bucket i+1's —
    bucket order == key order."""
    val = _hex4_to_uint(keys)
    return pa.array((val * num_buckets // 65536).astype(np.int32))


def _check_kernel(kernel: str) -> None:
    if kernel not in SAMPLING_KERNELS:
        raise ValueError(f"unknown sampling hash kernel {kernel!r}; "
                         f"supported: {SAMPLING_KERNELS}")


def hash_sample(ds, col: str, threshold: str = "28", kernel: str = "md5"):
    """Deterministic sample: keep rows with ``hash(col) < threshold`` (hex
    prefix compare; '28' ≈ 40/256 ≈ 15.6%). Pure per-batch filter."""
    _check_kernel(kernel)

    def stage(t: pa.Table) -> pa.Table:
        h = _hash_col(t, col, kernel=kernel)
        return t.filter(pc.less(h, pa.scalar(threshold)))

    return ds.map_batches(stage, batch_format="pyarrow")


def deterministic_shuffle(ds, col: str, seed: str = "s0",
                          key_col: str = "shuffle_key",
                          kernel: str = "md5",
                          layout: str = "sorted", num_buckets: int = 64,
                          phys_partitions: int | None = None):
    """Seeded deterministic shuffle: the permutation is defined by
    ``hash(seed || col)`` — the same at any parallelism (unlike
    ``ds.random_shuffle``). The key column stays in the output so the
    order is verifiable downstream.

    ``layout="bucketed"`` (the multi-node / 100 TB path): keys are
    range-bucketed on their first 4 hex nibbles — static boundaries, no
    sample pass — then ONE hash exchange (``repartition(P, keys=
    ["_shuffle_bucket"], sort=True)`` under Ray's hash-shuffle strategy,
    scoped to this dataset's own DataContext — the global context is not
    touched) co-locates each bucket, and a zero-copy per-block
    ``Table.sort_by`` orders ``(bucket, key)``. The output carries
    ``_shuffle_bucket``; rows ordered by ``(_shuffle_bucket, key_col)``
    — i.e. buckets concatenated in bucket order — are EXACTLY the
    ``layout="sorted"`` permutation, because bucket boundaries are
    key-prefix ranges (tested). The determinism contract is per BUCKET
    VALUE: every bucket's rows are contiguous and in permutation order,
    at any cluster size — a consumer wanting reproducible shards must
    shard by ``_shuffle_bucket``, NOT by physical block. Block
    boundaries (which whole buckets share a block) follow the exchange
    width: ``phys_partitions`` when given, else the cluster CPU count —
    pin ``phys_partitions`` if block boundaries themselves must be
    reproducible across cluster shapes. (Physical width cannot default
    to ``num_buckets``: each hash-shuffle partition reserves an
    aggregator's CPU+memory, and 64 partitions deadlock a 4-CPU
    cluster — measured.)

    ``layout="sorted"``: the global ``ds.sort`` total order — one
    physically ordered stream. Measured (BASELINE.md "deterministic
    shuffle layouts"): single-node the sort wins (1.7 s vs 7.2 s at 2M
    rows, 7.8 s vs 10.0 s at 10M — Ray's hash-shuffle aggregator pool
    carries ~5 s fixed startup that amortizes slowly), so sort stays
    the single-node choice; multi-node, the sort's boundary-sampling
    pass + skew-sensitive range exchange lose to the static-boundary
    hash exchange, which is the bucketed layout's reason to exist.

    The default is ``sorted`` on EVERY cluster shape: unlike the engine's
    auto-late-exchange (an internal strategy switch whose outputs are
    manifest-for-manifest identical), the two layouts here differ in
    OBSERVABLE output — physical stream order and the extra
    ``_shuffle_bucket`` column — so silently switching by cluster shape
    would reintroduce exactly the cluster-size dependence this function
    exists to eliminate. ``bucketed`` is the explicit scale opt-in with
    the ``(_shuffle_bucket, key_col)`` composite-order contract.
    """

    _check_kernel(kernel)

    def stage(t: pa.Table) -> pa.Table:
        return t.append_column(key_col, _hash_col(t, col, seed, kernel))

    keyed = ds.map_batches(stage, batch_format="pyarrow")
    if layout == "sorted":
        return keyed.sort(key_col)
    if layout != "bucketed":
        raise ValueError(f"unknown layout {layout!r}")

    def bucket_stage(t: pa.Table) -> pa.Table:
        k = t[key_col]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return t.append_column("_shuffle_bucket",
                               _bucket_from_hex(k, num_buckets))

    def block_sort(t: pa.Table) -> pa.Table:
        return t.sort_by([("_shuffle_bucket", "ascending"),
                          (key_col, "ascending")])

    from ray.data.context import ShuffleStrategy

    # The bucket COLUMN (num_buckets, part of the determinism contract) and
    # the physical exchange width are independent: each hash-shuffle
    # partition aggregator reserves CPU + memory, so the default width is
    # capped at the cluster CPU count. A partition holds whole buckets, so
    # per-bucket content is deterministic at any width; block BOUNDARIES
    # follow the width — callers needing reproducible boundaries pass
    # phys_partitions explicitly (see docstring).
    if phys_partitions is not None:
        phys = max(1, min(num_buckets, int(phys_partitions)))
    else:
        try:
            import ray

            phys = max(2, min(num_buckets,
                              int(ray.cluster_resources().get("CPU", 2))))
        except Exception:
            phys = num_buckets
    out = (keyed.map_batches(bucket_stage, batch_format="pyarrow")
           .repartition(phys, keys=["_shuffle_bucket"], sort=True)
           .map_batches(block_sort, batch_format="pyarrow",
                        batch_size=None, zero_copy_batch=True))
    # scoped to this dataset chain's captured context; the process-global
    # DataContext keeps its configured strategy
    out.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return out


def hash_split(ds, col: str, fractions: dict[str, float],
               seed: str = "split0", kernel: str = "md5",
               split_col: str = "split"):
    """Deterministic dataset split (train/val/test): append ``split_col``
    with the label whose cumulative-fraction interval contains the row's
    hash position ``int(hash(seed || col)[:4], 16) / 65536``.

    Pure per-batch map — no shuffle, no RNG state, independent of
    cluster size and block boundaries: the same ``(seed, kernel)``
    reproduces the identical assignment on any cluster, and a key lands
    in the same split across reruns and resharding (the property random
    splits lose). Interval edges quantize to 1/65536 of the keyspace
    (4 hex nibbles), so each fraction is honored to ±0.002%; the md5
    kernel is SQL-reproducible
    (``substr(md5(seed || col), 1, 4) < '<hex edge>'``)."""
    _check_kernel(kernel)
    labels = list(fractions)
    edges = _split_edges_int(fractions)  # shared with split_edges_hex
    label_arr = pa.array(labels, type=pa.string())
    last = len(labels) - 1

    def stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(split_col, pa.array([], pa.string()))
        h = _hash_col(t, col, seed, kernel)
        val = _hex4_to_uint(h)
        idx = np.searchsorted(edges, val, side="right")
        kcol = t[col]
        if kcol.null_count:
            # null keys take the LAST label — the SQL CASE chain's NULL
            # comparisons fall through to the ELSE arm, and the Python
            # side must agree for the oracle contract to hold
            nulls = pc.is_null(kcol).to_numpy(zero_copy_only=False)
            idx[nulls] = last
        return t.append_column(
            split_col, pc.take(label_arr, pa.array(idx, pa.int64())))

    return ds.map_batches(stage, batch_format="pyarrow")


def _split_edges_int(fractions: dict[str, float]) -> np.ndarray:
    """Interior split edges as uint64 in [0, 65536] — the ONE quantization
    both :func:`hash_split` and :func:`split_edges_hex` derive from (two
    independent roundings could disagree at a boundary and silently break
    the SQL oracle)."""
    if not fractions or any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative and non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    cum = np.cumsum(list(fractions.values()))
    return np.round(cum[:-1] * 65536).astype(np.uint64)


def split_edges_hex(fractions: dict[str, float]) -> list[str]:
    """The interior split edges as hex strings for rendering the
    equivalent SQL ``CASE WHEN substr(md5(seed || col), 1, 4) < '<edge>'``
    chain. An edge that quantizes to the full keyspace (65536) renders as
    ``'g000'`` — lexicographically above every 4-hex-digit prefix, so the
    comparison is always true, matching ``val < 65536`` on the Python
    side (a naive '10000' would string-compare BELOW most prefixes and
    invert the split)."""
    return [format(int(e), "04x") if e < 65536 else "g000"
            for e in _split_edges_int(fractions)]


def stratified_cap(ds, group_col: str, col: str, cap: int, seed: str = "s0",
                   kernel: str = "md5"):
    """At most ``cap`` rows per group, selected by the seeded hash order
    (stable under resharding): the per-domain / per-language quota of a
    training mix. One groupby exchange; selection inside the group is a
    vectorized sort-head."""
    _check_kernel(kernel)

    def stage(t: pa.Table) -> pa.Table:
        return t.append_column("_sk", _hash_col(t, col, seed, kernel))

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("_sk").head(cap).drop(columns=["_sk"])

    return (
        ds.map_batches(stage, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(head, batch_format="pandas")
    )


def group_topk(ds, group_col: str, value_col: str, id_col: str, k: int,
               descending: bool = True):
    """Top-``k`` rows per group by ``value_col`` (ties broken by
    ``id_col`` ascending, so the selection is total and deterministic) —
    the value-ordered sibling of :func:`stratified_cap`'s hash-ordered
    quota: "keep the k longest / highest-quality documents per
    language". One groupby exchange; selection inside the group is a
    vectorized sort-head, SQL-reproducible as ``row_number() OVER
    (PARTITION BY g ORDER BY v DESC, id) <= k``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = "descending" if descending else "ascending"

    def head(g: pa.Table) -> pa.Table:
        return g.sort_by([(value_col, order),
                          (id_col, "ascending")]).slice(0, k)

    return ds.groupby(group_col).map_groups(head, batch_format="pyarrow")

"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` (the small-side broadcast pattern; never re-shipped per batch),
every batch does one numpy matmul, emits its local top-k per query, and a
tiny ``groupby(query_id)`` reduces the per-batch candidates to the global
top-k. Shuffle volume: O(num_queries × k × num_blocks) rows, independent of
corpus size.

Scale path: IVF — k-means-ish coarse centroids (trained on a sample),
vectors bucketed by nearest centroid (one shuffle keyed by centroid id),
queries probe only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def fixed_dim_matrix(col, dtype=np.float32) -> np.ndarray:
    """(n, d) matrix from a fixed-dimension ``list<float>`` column —
    zero-copy from the Arrow values buffer (``flatten().to_numpy()``
    reads the child array directly; ``np.stack(col.to_pylist())`` would
    materialize n Python lists first). Falls back to the per-row path for
    ragged or null-bearing columns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count == 0:
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(n, int(lens[0])), dtype=dtype
            )
    return np.stack(col.to_pylist()).astype(dtype)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     query_ids: np.ndarray | None = None):
    """-> Dataset of (query_id, vec_id, cosine) rows, k per query."""
    import ray

    qmat = _normalize(np.asarray(queries, dtype=np.float32))
    qids = np.arange(len(qmat)) if query_ids is None else np.asarray(query_ids)
    qref = ray.put(qmat)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)  # zero-copy from object store, once per task
        vecs = _normalize(fixed_dim_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col].to_pylist())
        scores = q @ vecs.T                     # (nq, batch)
        kk = min(k, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        out_q, out_v, out_s = [], [], []
        for r in range(scores.shape[0]):
            for c in top[r]:
                out_q.append(int(qids[r]))
                out_v.append(ids[c])
                out_s.append(float(scores[r, c]))
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v),
                         "cosine": pa.array(out_s, type=pa.float64())})

    candidates = ds.map_batches(local_topk, batch_format="pyarrow")

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return candidates.groupby("query_id").map_groups(global_topk, batch_format="pandas")


class IVFIndex:
    """Inverted-file ANN: coarse centroids + bucketed vectors.

    ``fit`` trains centroids on a driver-side sample (a few thousand rows);
    ``assign`` is a streamed ``map_batches`` adding a ``centroid`` column —
    the bucketing key for a layout-stable shuffle; ``search`` probes the
    ``nprobe`` nearest buckets only.
    """

    def __init__(self, num_centroids: int = 16, iters: int = 10, seed: int = 5):
        self.num_centroids = num_centroids
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(sample, dtype=np.float32))
        rng = np.random.RandomState(self.seed)
        c = x[rng.choice(len(x), size=min(self.num_centroids, len(x)), replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def assign(self, ds, vec_col: str = "embedding"):
        import ray

        cref = ray.put(self.centroids)

        def stage(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vecs = _normalize(fixed_dim_matrix(batch[vec_col]))
            a = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(a))

        return ds.map_batches(stage, batch_format="pyarrow")

    def search(self, assigned_ds, queries: np.ndarray, k: int = 10, nprobe: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id"):
        assert self.centroids is not None, "fit() first"
        qmat = _normalize(np.asarray(queries, dtype=np.float32))
        probe = np.argsort(-(qmat @ self.centroids.T), axis=1)[:, :nprobe]
        probe_sets = [set(p.tolist()) for p in probe]
        import ray

        qref = ray.put(qmat)
        pref = ray.put(probe_sets)

        def local_topk(batch: pa.Table) -> pa.Table:
            q, psets = ray.get(qref), ray.get(pref)
            cents = np.asarray(batch["centroid"].to_pylist())
            vecs = _normalize(fixed_dim_matrix(batch[vec_col]))
            ids = np.asarray(batch[id_col].to_pylist())
            out_q, out_v, out_s = [], [], []
            for qi in range(len(q)):
                mask = np.isin(cents, list(psets[qi]))
                if not mask.any():
                    continue
                sc = vecs[mask] @ q[qi]
                sub_ids = ids[mask]
                kk = min(k, len(sc))
                top = np.argpartition(-sc, kk - 1)[:kk]
                for c in top:
                    out_q.append(qi)
                    out_v.append(sub_ids[c])
                    out_s.append(float(sc[c]))
            return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                             "vec_id": pa.array(out_v),
                             "cosine": pa.array(out_s, type=pa.float64())})

        cands = assigned_ds.map_batches(local_topk, batch_format="pyarrow")

        def global_topk(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

        return cands.groupby("query_id").map_groups(global_topk, batch_format="pandas")

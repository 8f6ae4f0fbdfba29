"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's content-hash exact dedup
(``GetGeoMesaKafkaRecord.scala:458-476`` + keyed overwrite), this module adds
the near-dup family a web-scale corpus needs. All operators are Ray-Data
first: per-batch vectorized signature computation in ``map_batches``,
candidate generation through ONE ``groupby`` on a band/bucket key (the only
shuffle), and signature-based verification — no all-pairs comparison ever
touches the full corpus.

Scale notes (100 TB): signatures are tiny (64×u64 per doc) compared to the
text, so the shuffle moves ~0.1% of input bytes; band buckets are capped
(``max_bucket``) so a degenerate bucket (boilerplate pages) cannot produce
O(n²) pairs; connected components use K rounds of min-label propagation
(each a small groupby over doc_id-sized rows), never a driver-side
union-find over the full corpus.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------- exact dedup --


def add_content_hash(ds, cols: list[str], out_col: str = "content_hash"):
    """md5 over the concatenated columns (chr(31)-separated) — DuckDB oracle:
    ``md5(col1 || chr(31) || col2 …)``."""

    def stage(batch: pa.Table) -> pa.Table:
        parts = [pc.cast(batch[c], pa.string()) for c in cols]
        joined = pc.binary_join_element_wise(*parts, "\x1f") if len(parts) > 1 else parts[0]
        hashes = [
            None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
            for v in joined.to_pylist()
        ]
        return batch.append_column(out_col, pa.array(hashes, type=pa.string()))

    return ds.map_batches(stage, batch_format="pyarrow")


def exact_dedup(ds, cols: list[str], id_col: str, keep: str = "min"):
    """Keep one representative row per exact content (min/max id wins).

    Two-phase: per-batch partial reduction (combiner) then one groupby over
    the already-reduced rows — a duplicate-heavy corpus mostly collapses
    before the shuffle.
    """
    ds = add_content_hash(ds, cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        idx = (
            df.groupby("content_hash")[id_col].idxmin()
            if keep == "min"
            else df.groupby("content_hash")[id_col].idxmax()
        )
        return pa.Table.from_pandas(df.loc[sorted(idx)], preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        return g.head(1) if keep == "min" else g.tail(1)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(final, batch_format="pandas")
    )


# --------------------------------------------------------------- shingling --

_MERSENNE = (1 << 61) - 1


def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """crc32 of each k-char shingle (deterministic, fast)."""
    if text is None or len(text) < k:
        return np.array([zlib.crc32((text or "").encode("utf-8"))], dtype=np.uint64)
    data = text.encode("utf-8", "replace")
    # byte-level shingles approximate char shingles deterministically
    out = np.empty(max(1, len(data) - k + 1), dtype=np.uint64)
    crc = zlib.crc32
    for i in range(len(out)):
        out[i] = crc(data[i : i + k])
    return out


def _word_shingle_hashes(text: str, k: int) -> np.ndarray:
    words = (text or "").split()
    if len(words) < k:
        return np.array([zlib.crc32((text or "").encode())], dtype=np.uint64)
    crc = zlib.crc32
    return np.fromiter(
        (crc(" ".join(words[i : i + k]).encode("utf-8")) for i in range(len(words) - k + 1)),
        dtype=np.uint64,
        count=len(words) - k + 1,
    )


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    # a < 2^29 and shingle hashes < 2^32 keep a*x + b < 2^62: exact uint64
    # arithmetic, fully vectorized (no bigint fallback)
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 29, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod 2^61-1 over the shingle set."""
    x = np.unique(shingles)
    sig = np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    for lo in range(0, len(x), 8192):  # chunk the outer product for huge docs
        chunk = x[lo : lo + 8192]
        v = (chunk[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        np.minimum(sig, v.min(axis=0), out=sig)
    return sig


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor
    (``__init__``), signatures + band rows emitted per batch."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        shingle_mode: str = "char",
        seed: int = 1729,
    ):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.k, self.mode = shingle_k, shingle_mode
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = (
            _char_shingle_hashes(text, self.k)
            if self.mode == "char"
            else _word_shingle_hashes(text, self.k)
        )
        return minhash_signature(sh, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit (doc_id, band_id, band_hash, shard, signature) — one row per
        band. ``shard`` coarsens the bucket key so the downstream exchange
        groups 64 shards instead of millions of tiny band buckets (the
        per-group Python dispatch would otherwise dominate)."""
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash, out_shard, out_sig = [], [], [], [], []
        r = self.rows_per_band
        for i, t in zip(ids, texts):
            sig = self.signature(t)
            sig_bytes = sig.tobytes()
            for bnd in range(self.bands):
                h = hashlib.md5(sig[bnd * r : (bnd + 1) * r].tobytes()).hexdigest()[:16]
                out_id.append(i)
                out_band.append(bnd)
                out_hash.append(h)
                out_shard.append(zlib.crc32(f"{bnd}:{h}".encode()) % 64)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.string()),
                "shard": pa.array(out_shard, type=pa.int32()),
                "signature": pa.array(out_sig, type=pa.binary()),
            }
        )


def minhash_candidate_pairs(ds, *, max_bucket: int = 64, threshold: float = 0.7, **stage_kw):
    """docs Dataset -> verified near-dup pairs (doc_a, doc_b, est_jaccard).

    Pipeline: map_batches(MinHashStage, actor pool) -> groupby(band key)
    -> pairs within bucket (capped) -> estimate jaccard from signature
    agreement -> filter >= threshold -> distinct pairs.
    """
    banded = ds.map_batches(MinHashStage, fn_constructor_kwargs=stage_kw,
                            batch_format="pyarrow", concurrency=2)

    def shard_pairs(shard: pd.DataFrame) -> pd.DataFrame:
        """One call per shard (64 total): vectorized pandas groupby over the
        shard's band buckets; pair enumeration only inside multi-doc buckets."""
        rows = []
        for _, g in shard.groupby(["band_id", "band_hash"], sort=False):
            g = g.drop_duplicates("doc_id")
            n = len(g)
            if n < 2:
                continue
            g = g.sort_values("doc_id").head(max_bucket)
            ids = g["doc_id"].to_numpy()
            sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["signature"]])
            for i in range(len(g)):
                eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                for j, e in enumerate(eq, start=i + 1):
                    if e >= threshold:
                        rows.append((ids[i], ids[j], float(e)))
        out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])
        out["pair_shard"] = (
            pd.util.hash_pandas_object(out["doc_a"].astype(str) + "|" + out["doc_b"].astype(str),
                                       index=False) % 64
        ).astype("int64") if len(out) else pd.Series([], dtype="int64")
        return out

    pairs = banded.groupby("shard").map_groups(shard_pairs, batch_format="pandas")

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pair_shard"])

    return pairs.groupby("pair_shard").map_groups(dedup_shard, batch_format="pandas")


def assign_duplicate_clusters(pairs_df: pd.DataFrame, rounds: int = 8) -> pd.DataFrame:
    """doc -> cluster representative (min doc_id over connected component).

    Driver-side min-label propagation over the PAIR set (small relative to
    the corpus; at larger scale run the same iteration as Ray groupbys)."""
    label: dict = {}
    edges = list(zip(pairs_df["doc_a"], pairs_df["doc_b"]))
    for a, b in edges:
        label.setdefault(a, a)
        label.setdefault(b, b)
    for _ in range(rounds):
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
        if not changed:
            break
    return pd.DataFrame({"doc_id": list(label), "cluster": [label[d] for d in label]})


# ----------------------------------------------------------------- simhash --


class SimHashStage:
    """64-bit SimHash over word tokens; candidates via 4×16-bit band buckets."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", seed: int = 99):
        self.text_col, self.id_col = text_col, id_col
        self.seed = seed

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in (text or "").split():
            h = int.from_bytes(
                hashlib.blake2b(w.encode("utf-8"), digest_size=8,
                                key=self.seed.to_bytes(4, "little")).digest(),
                "little",
            )
            bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
            acc += bits * 2 - 1
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        hashes = [self.simhash(t) for t in batch[self.text_col].to_pylist()]
        out_id, out_band, out_key, out_shard, out_h = [], [], [], [], []
        for i, h in zip(ids, hashes):
            for bnd in range(4):
                key = (h >> (16 * bnd)) & 0xFFFF
                out_id.append(i)
                out_band.append(bnd)
                out_key.append(key)
                out_shard.append((bnd * 16381 + key) % 64)
                out_h.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.int32()),
                "shard": pa.array(out_shard, type=pa.int32()),
                "simhash": pa.array(out_h, type=pa.uint64()),
            }
        )


def simhash_candidate_pairs(ds, *, max_hamming: int = 3, max_bucket: int = 64, **kw):
    banded = ds.map_batches(SimHashStage, fn_constructor_kwargs=kw,
                            batch_format="pyarrow", concurrency=2)

    def shard_pairs(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in shard.groupby(["band_id", "band_key"], sort=False):
            g = g.drop_duplicates("doc_id")
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id").head(max_bucket)
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(g)):
                x = hs[i + 1 :] ^ hs[i]
                d = np.array([bin(int(v)).count("1") for v in x])
                for j, dist in enumerate(d, start=i + 1):
                    if dist <= max_hamming:
                        rows.append((ids[i], ids[j], int(dist)))
        out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])
        out["pair_shard"] = (
            pd.util.hash_pandas_object(
                out["doc_a"].astype(str) + "|" + out["doc_b"].astype(str), index=False
            ) % 64
        ).astype("int64") if len(out) else pd.Series([], dtype="int64")
        return out

    pairs = banded.groupby("shard").map_groups(shard_pairs, batch_format="pandas")
    return pairs.groupby("pair_shard").map_groups(
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pair_shard"]),
        batch_format="pandas",
    )


# ------------------------------------------------------- exact n-gram sets --


def ngram_jaccard_pairs(ds, *, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_bucket: int = 256):
    """Exact word-n-gram Jaccard near-dup pairs.

    Candidates are generated by bucketing on the min n-gram hash (cheap
    LSH-like blocking: exact duplicates and heavy overlaps share minima),
    then verified with exact Jaccard inside the bucket.
    """

    def sig_stage(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        keys, shards, grams = [], [], []
        for t in texts:
            g = _word_shingle_hashes(t or "", n)
            u = np.unique(g)
            k = int(u.min())
            keys.append(k)
            shards.append(k % 64)
            grams.append(u.tobytes())
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "block": pa.array(keys, type=pa.int64()),
                "shard": pa.array(shards, type=pa.int32()),
                "grams": pa.array(grams, type=pa.binary()),
            }
        )

    def verify_shard(shard: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in shard.groupby("block", sort=False):
            g = g.drop_duplicates("doc_id")
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id").head(max_bucket)
            ids = g["doc_id"].to_numpy()
            sets = [set(np.frombuffer(b, dtype=np.uint64).tolist()) for b in g["grams"]]
            for i in range(len(g)):
                for j in range(i + 1, len(g)):
                    inter = len(sets[i] & sets[j])
                    union = len(sets[i] | sets[j])
                    jac = inter / union if union else 0.0
                    if jac >= threshold:
                        rows.append((ids[i], ids[j], jac))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    return (
        ds.map_batches(sig_stage, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(verify_shard, batch_format="pandas")
    )


# ------------------------------------------------- embedding cosine dedup --


def embedding_neardup_pairs(ds, *, tau: float = 0.95, vec_col: str = "embedding",
                            id_col: str = "vec_id"):
    """Near-dup pairs by cosine similarity >= tau.

    Baseline path: the full (normalized) matrix is broadcast once via
    ``ray.put`` and every batch does one numpy matmul against it —
    O(n·batch) FLOPs but zero shuffle; right up to ~1e6 vectors. The scale
    path for 1e9+ vectors is :func:`embedding_lsh_neardup_pairs`.
    """
    import ray

    mat, ids = _collect_normalized(ds, vec_col, id_col)
    ref_mat, ref_ids = ray.put(mat), ray.put(ids)

    def stage(batch: pa.Table) -> pa.Table:
        all_mat, all_ids = ray.get(ref_mat), ray.get(ref_ids)
        bmat = _normalize(np.stack(batch[vec_col].to_pylist()).astype(np.float32))
        bids = np.asarray(batch[id_col].to_pylist())
        id_type = batch[id_col].type
        scores = bmat @ all_mat.T
        rows_a, rows_b, sims = [], [], []
        for r in range(scores.shape[0]):
            hit = np.flatnonzero(scores[r] >= tau)
            for c in hit:
                if bids[r] < all_ids[c]:  # canonical orientation, no self pairs
                    rows_a.append(bids[r])
                    rows_b.append(all_ids[c])
                    sims.append(float(scores[r, c]))
        return pa.table({"doc_a": pa.array(rows_a, type=id_type),
                         "doc_b": pa.array(rows_b, type=id_type),
                         "cosine": pa.array(sims, type=pa.float64())})

    return ds.map_batches(stage, batch_format="pyarrow")


def embedding_lsh_neardup_pairs(ds, *, tau: float = 0.9, planes: int = 16,
                                vec_col: str = "embedding", id_col: str = "vec_id",
                                seed: int = 31, max_bucket: int = 512):
    """Scale path: random-hyperplane LSH bucketing, exact cosine verify
    within buckets — one groupby shuffle over (bucket, id, vector)."""
    def sig_stage(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_pylist()).astype(np.float32)
        rng = np.random.RandomState(seed)
        proj = rng.standard_normal((vecs.shape[1], planes)).astype(np.float32)
        bits = (vecs @ proj) > 0
        keys = bits.dot(1 << np.arange(planes, dtype=np.int64))
        return pa.table(
            {
                "vec_id": batch[id_col],
                "bucket": pa.array(keys, type=pa.int64()),
                "vec": pa.array([v.tobytes() for v in _normalize(vecs)], type=pa.binary()),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id").head(max_bucket)
        ids = g["vec_id"].to_numpy()
        mat = np.stack([np.frombuffer(b, dtype=np.float32) for b in g["vec"]])
        scores = mat @ mat.T
        rows = []
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if scores[i, j] >= tau:
                    rows.append((ids[i], ids[j], float(scores[i, j])))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "cosine"])

    return (
        ds.map_batches(sig_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _collect_normalized(ds, vec_col: str, id_col: str):
    """Materialize ids + normalized vectors on the driver for broadcast.
    Only valid for small-side data (the broadcast-join pattern)."""
    tbl = pa.concat_tables(
        [b.select([id_col, vec_col]) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    ids = np.asarray(tbl[id_col].to_pylist())
    mat = _normalize(np.stack(tbl[vec_col].to_pylist()).astype(np.float32))
    order = np.argsort(ids, kind="stable")
    return mat[order], ids[order]

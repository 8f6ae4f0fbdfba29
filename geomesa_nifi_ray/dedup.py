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
O(n²) pairs; connected components run the alternating Large-Star /
Small-Star algorithm as coarsened groupby rounds over the EDGE set only —
no label table exists anywhere (driver or broadcast), so the near-dup
membership can reach billions of nodes without a driver-memory ceiling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geomesa_nifi_ray.similarity import fixed_dim_matrix

# ------------------------------------------------------------- exact dedup --


def add_content_hash(ds, cols: list[str], out_col: str = "content_hash",
                     kernel: str = "md5"):
    """Content hash over the concatenated columns (chr(31)-separated).
    ``md5`` (default) matches the DuckDB oracle ``md5(col1 || chr(31) ||
    col2 …)``; ``xx64`` is the vectorized scale kernel (hashing.py)."""
    from geomesa_nifi_ray.hashing import content_hash_generic

    def stage(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, content_hash_generic(batch, cols, kernel)
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def exact_dedup(ds, cols: list[str], id_col: str, keep: str = "min",
                hash_kernel: str = "md5"):
    """Keep one representative row per exact content (min/max id wins).

    Two-phase: per-batch partial reduction (combiner) then one groupby over
    the already-reduced rows — a duplicate-heavy corpus mostly collapses
    before the shuffle.
    """
    ds = add_content_hash(ds, cols, kernel=hash_kernel)

    def reduce_one_per_hash(t: pa.Table) -> pa.Table:
        """Arrow-native: sort by (hash, id) then keep the first/last row of
        each hash run — used both as per-batch combiner and final reduce."""
        order = "ascending" if keep == "min" else "descending"
        idx = pc.sort_indices(
            t, sort_keys=[("content_hash", "ascending"), (id_col, order)]
        )
        t = t.take(idx)
        codes = t["content_hash"].combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        )
        first_in_run = np.r_[True, codes[1:] != codes[:-1]]
        return t.take(pa.array(np.flatnonzero(first_in_run)))

    return (
        ds.map_batches(reduce_one_per_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(reduce_one_per_hash, batch_format="pyarrow")
    )


# --------------------------------------------------------------- shingling --

_MERSENNE = (1 << 61) - 1


def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """32-bit hash of every k-byte shingle, fully vectorized (numpy rolling
    polynomial hash + splitmix64 finalizer; byte-level shingles approximate
    char shingles deterministically). 32-bit outputs keep the downstream
    ``a*x + b`` minhash arithmetic exact in uint64."""
    from geomesa_nifi_ray.text import _mix64, rolling_window_hashes

    data = np.frombuffer((text or "").encode("utf-8", "replace"), dtype=np.uint8)
    h = rolling_window_hashes(data + np.uint64(1), k)
    return _mix64(h) >> np.uint64(32)


def _word_shingle_hashes(text: str, k: int) -> np.ndarray:
    """32-bit hash of every k-word shingle: per-word siphash via
    ``pd.util.hash_array`` (C kernel, deterministic fixed key), then the
    vectorized rolling combine over the word-hash sequence — no per-window
    string joining."""
    from geomesa_nifi_ray.text import _mix64, rolling_window_hashes

    words = (text or "").split()
    if not words:
        return _char_shingle_hashes(text or "", k)
    wh = pd.util.hash_array(np.asarray(words, dtype=object))
    h = rolling_window_hashes(wh, k)
    return _mix64(h) >> np.uint64(32)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-permutation odd multipliers + offsets (uint64). The hash is
    ``mix64(a*x + b)`` with natural mod-2^64 wraparound: multiply-shift by
    an odd constant then a splitmix64 finalizer — near-uniform over uint64,
    so the per-permutation minimum behaves like a random permutation's.
    (A plain ``(a*x+b) mod p`` with small ``a`` is piecewise *monotonic* in
    x — at most one wrap — and badly violates min-wise independence: two
    sets with Jaccard 0.85 measured signature agreement ~0.5.)"""
    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 1 << 62, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of ``mix64(a*x + b)`` (mod 2^64) over the shingle set."""
    from geomesa_nifi_ray.text import _mix64

    x = np.unique(shingles)
    sig = np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for lo in range(0, len(x), 8192):  # chunk the outer product for huge docs
            chunk = x[lo : lo + 8192]
            v = _mix64(chunk[:, None] * a[None, :] + b[None, :])
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
        per-group Python dispatch would otherwise dominate). Band hashing is
        one vectorized xor-mix chain over the whole batch (no per-row md5)."""
        from geomesa_nifi_ray.text import _mix64

        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        r = self.rows_per_band
        bands = sigs.reshape(n, self.bands, r)
        with np.errstate(over="ignore"):
            h = np.broadcast_to(
                np.arange(self.bands, dtype=np.uint64)[None, :], (n, self.bands)
            ).copy()  # band-id salt so identical band contents across bands differ
            for j in range(r):
                h = _mix64(h ^ bands[:, :, j])
        idx = np.repeat(np.arange(n), self.bands)
        doc_id = batch[self.id_col].take(pa.array(idx))
        sig_bytes = np.repeat(
            np.fromiter((s.tobytes() for s in sigs), dtype=object, count=n), self.bands
        )
        return pa.table(
            {
                "doc_id": doc_id,
                "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(h.reshape(-1), type=pa.uint64()),
                "shard": pa.array((h.reshape(-1) % np.uint64(64)).astype(np.int32)),
                "signature": pa.array(sig_bytes, type=pa.binary()),
            }
        )


def minhash_candidate_pairs(ds, *, max_bucket: int = 64, threshold: float = 0.7,
                            concurrency: int = 8, **stage_kw):
    """docs Dataset -> verified near-dup pairs (doc_a, doc_b, est_jaccard).

    Pipeline: map_batches(MinHashStage, actor pool) -> groupby(band key)
    -> pairs within bucket (capped) -> estimate jaccard from signature
    agreement -> filter >= threshold -> distinct pairs.
    """
    # instance => task pool: stage state is two tiny permutation arrays
    # (pickled per task for free); an actor pool paid ~1.2 s startup per
    # query for nothing (same adjudication as the langid/quality stages —
    # BASELINE.md "Langid/quality vectorization"). `concurrency` is kept
    # for API compatibility; Ray's task pool auto-scales.
    del concurrency
    banded = ds.map_batches(MinHashStage(**stage_kw), batch_format="pyarrow")

    def shard_pairs(shard: pd.DataFrame) -> pd.DataFrame:
        """One call per shard (64 total), pure numpy: one decode pass for
        all signatures, lexsort group runs for the band buckets (no pandas
        per-group dispatch), an identical-bucket memo (a dup *cluster*
        re-forms the same bucket in every band — verify it once), and a
        vectorized n×n signature-agreement matrix per bucket."""
        rows: list[tuple] = []
        if len(shard):
            bh = shard["band_hash"].to_numpy(dtype=np.uint64, copy=False)
            ids = shard["doc_id"].to_numpy()
            idh = pd.util.hash_array(ids)
            sig_mat = np.frombuffer(
                b"".join(shard["signature"]), dtype=np.uint64
            ).reshape(len(shard), -1)
            order = np.lexsort((idh, bh))
            bh_s, ids_s, idh_s, sig_s = bh[order], ids[order], idh[order], sig_mat[order]
            bounds = np.flatnonzero(np.r_[True, bh_s[1:] != bh_s[:-1], True])
            seen: set[int] = set()
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                if s1 - s0 < 2:
                    continue
                gh, gi = idh_s[s0:s1], ids_s[s0:s1]
                um = np.r_[True, gh[1:] != gh[:-1]]  # sorted -> consecutive dups
                gi, gh, gs = gi[um], gh[um], sig_s[s0:s1][um]
                n = len(gi)
                if n < 2:
                    continue
                if n > max_bucket:
                    gi, gh, gs, n = gi[:max_bucket], gh[:max_bucket], gs[:max_bucket], max_bucket
                memo = (int(np.bitwise_xor.reduce(gh)) << 8) ^ n
                if memo in seen:
                    continue
                seen.add(memo)
                eq = (gs[:, None, :] == gs[None, :, :]).mean(axis=2)
                iu, ju = np.triu_indices(n, k=1)
                hit = eq[iu, ju] >= threshold
                for i, j, e in zip(iu[hit], ju[hit], eq[iu, ju][hit]):
                    a, b = (gi[i], gi[j]) if gi[i] < gi[j] else (gi[j], gi[i])
                    rows.append((a, b, float(e)))
        out = _pairs_df(rows, "est_jaccard", "float64",
                        id_dtype=shard["doc_id"].dtype if len(shard) else "int64")
        out["pair_shard"] = (
            pd.util.hash_pandas_object(out["doc_a"].astype(str) + "|" + out["doc_b"].astype(str),
                                       index=False) % 64
        ).astype("int64") if len(out) else pd.Series([], dtype="int64")
        return out

    pairs = banded.groupby("shard").map_groups(shard_pairs, batch_format="pandas")

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pair_shard"])

    return pairs.groupby("pair_shard").map_groups(dedup_shard, batch_format="pandas")


def _cc_shard_col(df: pd.DataFrame, col: str, num_shards: int) -> pd.Series:
    """Stable shard id of a node column (process-independent)."""
    vals = df[col]
    if pd.api.types.is_integer_dtype(vals):
        return ((vals.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(num_shards)).astype(np.int32)
    import zlib

    return vals.map(lambda v: zlib.crc32(str(v).encode()) % num_shards).astype(
        np.int32
    )


def duplicate_clusters_dataset(pairs_ds, num_shards: int = 64,
                               max_rounds: int = 20):
    """Connected components over the near-dup pair graph as a pure Ray Data
    computation — the web-scale path. Implements the alternating
    Large-Star / Small-Star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): the EDGE SET itself
    converges to stars pointing every node at its component minimum, so
    there is no label table anywhere — not on the driver, not broadcast.
    Each half-round is one coarsened ``groupby(shard)`` with vectorized
    pandas inside; the edge set is ``materialize()``d per round (it lives
    in the distributed object store, truncating lineage for the iteration).
    Converges in O(log^2 n) rounds worst-case; LSH dup clusters are
    near-cliques, so 2-3 rounds in practice.

    Returns a Dataset with columns ``(doc_id, cluster)`` covering every
    node that appears in a pair; cluster = min doc_id of the component.
    """
    import ray.data

    def large_star(df: pd.DataFrame) -> pd.DataFrame:
        # group key u carries ALL its neighbors (edges pre-emitted both
        # directions and sharded by u): attach neighbors v > u to
        # m = min(N(u) ∪ {u})
        df = df.drop(columns=["shard"])
        mins = df.groupby("u", sort=False)["v"].min().reset_index()
        mins["m"] = np.minimum(mins["u"].values, mins["v"].values)
        out = df.merge(mins[["u", "m"]], on="u")
        out = out[out["v"] > out["u"]][["v", "m"]]
        out.columns = ["u", "v"]          # edge (bigger-node -> its min)
        return out.drop_duplicates()

    def small_star(df: pd.DataFrame) -> pd.DataFrame:
        # edges oriented u=max, v=min and sharded by u: relink every
        # smaller neighbor (and u itself) to m = min(N(u) ∪ {u})
        df = df.drop(columns=["shard"])
        mins = df.groupby("u", sort=False)["v"].min().reset_index()
        mins["m"] = np.minimum(mins["u"].values, mins["v"].values)
        withm = df.merge(mins[["u", "m"]], on="u")
        a = withm[["v", "m"]]
        b = mins[["u", "m"]].rename(columns={"u": "v"})
        out = pd.concat([a, b], ignore_index=True)
        out = out[out["v"] != out["m"]]
        out.columns = ["u", "v"]
        return out.drop_duplicates()

    def emit_both(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"u": t["doc_a"].to_pandas(), "v": t["doc_b"].to_pandas()})
        both = pd.concat(
            [df, df.rename(columns={"u": "v", "v": "u"})], ignore_index=True
        )
        both["shard"] = _cc_shard_col(both, "u", num_shards)
        return both

    def orient_max_first(df: pd.DataFrame) -> pd.DataFrame:
        u = np.maximum(df["u"].values, df["v"].values)
        v = np.minimum(df["u"].values, df["v"].values)
        out = pd.DataFrame({"u": u, "v": v})
        out["shard"] = _cc_shard_col(out, "u", num_shards)
        return out

    def shard_for_large(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [df, df.rename(columns={"u": "v", "v": "u"})], ignore_index=True
        )
        both["shard"] = _cc_shard_col(both, "u", num_shards)
        return both

    def signature(ds) -> tuple[int, int]:
        """(edge count, order-insensitive checksum) via per-block partials —
        only two small numbers reach the driver."""

        def part(df: pd.DataFrame) -> pd.DataFrame:
            import zlib

            h = [zlib.crc32(f"{a}|{b}".encode()) for a, b in zip(df["u"], df["v"])]
            return pd.DataFrame({"n": [len(df)], "x": [int(np.sum(h, dtype=np.int64))]})

        parts = ds.map_batches(part, batch_format="pandas").take_all()
        return (sum(p["n"] for p in parts), sum(p["x"] for p in parts))

    edges = pairs_ds.map_batches(emit_both, batch_format="pyarrow")
    edges = edges.groupby("shard").map_groups(large_star, batch_format="pandas")
    edges = edges.map_batches(orient_max_first, batch_format="pandas")
    edges = edges.groupby("shard").map_groups(small_star, batch_format="pandas")
    edges = edges.materialize()
    sig = signature(edges)
    for _ in range(max_rounds):
        nxt = edges.map_batches(shard_for_large, batch_format="pandas")
        nxt = nxt.groupby("shard").map_groups(large_star, batch_format="pandas")
        nxt = nxt.map_batches(orient_max_first, batch_format="pandas")
        nxt = nxt.groupby("shard").map_groups(small_star, batch_format="pandas")
        nxt = nxt.materialize()
        nsig = signature(nxt)
        edges = nxt
        if nsig == sig:
            break
        sig = nsig

    # converged: edges are (node -> component min); roots label themselves
    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat(
            [df.rename(columns={"u": "doc_id", "v": "cluster"}),
             pd.DataFrame({"doc_id": df["v"], "cluster": df["v"]})],
            ignore_index=True,
        ).drop_duplicates()
        out["shard"] = _cc_shard_col(out, "doc_id", num_shards)
        return out

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["shard"])
        return df.groupby("doc_id", sort=False)["cluster"].min().reset_index()

    labeled = edges.map_batches(finalize, batch_format="pandas")
    return labeled.groupby("shard").map_groups(dedupe, batch_format="pandas")


def assign_duplicate_clusters_ds(pairs_ds, rounds: int = 16):
    """TEST HELPER ONLY: delegates to the Dataset-native alternating-star
    algorithm and collects the final (doc_id, cluster) table to a sorted
    pandas frame for small-scale assertions. No query path uses this —
    ``q_minhash_clusters_documents`` and the embedding-cluster query both
    return :func:`duplicate_clusters_dataset`'s Dataset directly, so no
    label table ever materializes on the driver."""
    out = duplicate_clusters_dataset(pairs_ds)
    df = out.to_pandas()
    return df.sort_values(["doc_id"]).reset_index(drop=True)


def assign_duplicate_clusters(pairs_df: pd.DataFrame, rounds: int = 8) -> pd.DataFrame:
    """doc -> cluster representative (min doc_id over connected component).

    Driver-side min-label propagation over the PAIR set (small relative to
    the corpus); :func:`assign_duplicate_clusters_ds` is the distributed
    groupby variant for web-scale pair graphs."""
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


def _pairs_df(rows: list[tuple], val_col: str, val_dtype: str,
              id_dtype="int64") -> pd.DataFrame:
    """Pair rows -> typed DataFrame; empty results carry explicit dtypes so
    Ray block schemas stay consistent across empty and non-empty shards."""
    if rows:
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", val_col])
    return pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype=id_dtype),
            "doc_b": pd.Series([], dtype=id_dtype),
            val_col: pd.Series([], dtype=val_dtype),
        }
    )


# ----------------------------------------------------------------- simhash --


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (np.bitwise_count needs numpy>=2)."""
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


class SimHashStage:
    """64-bit SimHash over word tokens; candidates via 4×16-bit band buckets."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", seed: int = 99):
        self.text_col, self.id_col = text_col, id_col
        self.seed = seed
        self._bitpos = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        """Vectorized: per-word siphash (C kernel) xor-mixed with the seed,
        bit matrix unpacked and summed in one numpy pass."""
        from geomesa_nifi_ray.text import _mix64

        words = (text or "").split()
        if not words:
            return 0
        wh = pd.util.hash_array(np.asarray(words, dtype=object))
        wh = _mix64(wh ^ np.uint64(self.seed))
        bits = ((wh[:, None] >> self._bitpos[None, :]) & np.uint64(1)).astype(np.int64)
        acc = 2 * bits.sum(axis=0) - len(wh)
        return int(((acc > 0).astype(np.uint64) << self._bitpos).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Band rows via numpy repeat/tile (same pattern as
        ``MinHashStage.__call__``) — per-row Python only for the simhash."""
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = len(ids)
        hashes = np.fromiter(
            (self.simhash(t) for t in batch[self.text_col].to_pylist()),
            dtype=np.uint64, count=n,
        )
        bands = np.tile(np.arange(4, dtype=np.uint64), n)       # n x 4 rows
        h_rep = np.repeat(hashes, 4)
        keys = ((h_rep >> (np.uint64(16) * bands)) & np.uint64(0xFFFF))
        shards = (bands.astype(np.int64) * 16381 + keys.astype(np.int64)) % 64
        id_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        return pa.table(
            {
                "doc_id": ids.take(id_idx),
                "band_id": pa.array(bands.astype(np.int32)),
                "band_key": pa.array(keys.astype(np.int32)),
                "shard": pa.array(shards.astype(np.int32)),
                "simhash": pa.array(h_rep),
            }
        )


def simhash_candidate_pairs(ds, *, max_hamming: int = 3, max_bucket: int = 64,
                            concurrency: int = 8, **kw):
    # instance => task pool (same adjudication as MinHashStage above)
    del concurrency
    banded = ds.map_batches(SimHashStage(**kw), batch_format="pyarrow")

    def shard_pairs(shard: pd.DataFrame) -> pd.DataFrame:
        """Pure-numpy bucket runs (see minhash shard_pairs): combined
        (band_id, band_key) run key, identical-bucket memo, vectorized
        pairwise hamming via popcount of the xor matrix."""
        rows: list[tuple] = []
        if len(shard):
            key = (
                shard["band_id"].to_numpy(dtype=np.int64) * 65536
                + shard["band_key"].to_numpy(dtype=np.int64)
            ).astype(np.uint64)
            ids = shard["doc_id"].to_numpy()
            idh = pd.util.hash_array(ids)
            hs = shard["simhash"].to_numpy().astype(np.uint64)
            order = np.lexsort((idh, key))
            key_s, ids_s, idh_s, hs_s = key[order], ids[order], idh[order], hs[order]
            bounds = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1], True])
            seen: set[int] = set()
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                if s1 - s0 < 2:
                    continue
                gh, gi = idh_s[s0:s1], ids_s[s0:s1]
                um = np.r_[True, gh[1:] != gh[:-1]]
                gi, gh, gv = gi[um], gh[um], hs_s[s0:s1][um]
                n = len(gi)
                if n < 2:
                    continue
                if n > max_bucket:
                    gi, gh, gv, n = gi[:max_bucket], gh[:max_bucket], gv[:max_bucket], max_bucket
                memo = (int(np.bitwise_xor.reduce(gh)) << 8) ^ n
                if memo in seen:
                    continue
                seen.add(memo)
                iu, ju = np.triu_indices(n, k=1)
                d = _popcount64(gv[iu] ^ gv[ju])
                hit = d <= max_hamming
                for i, j, dist in zip(iu[hit], ju[hit], d[hit]):
                    a, b = (gi[i], gi[j]) if gi[i] < gi[j] else (gi[j], gi[i])
                    rows.append((a, b, int(dist)))
        out = _pairs_df(rows, "hamming", "int64",
                        id_dtype=shard["doc_id"].dtype if len(shard) else "int64")
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
        rows: list[tuple] = []
        if len(shard):
            blk = shard["block"].to_numpy(dtype=np.int64).astype(np.uint64)
            ids = shard["doc_id"].to_numpy()
            idh = pd.util.hash_array(ids)
            grams = shard["grams"].to_numpy()
            order = np.lexsort((idh, blk))
            blk_s, ids_s, idh_s, gr_s = blk[order], ids[order], idh[order], grams[order]
            bounds = np.flatnonzero(np.r_[True, blk_s[1:] != blk_s[:-1], True])
            seen: set[int] = set()
            for s0, s1 in zip(bounds[:-1], bounds[1:]):
                if s1 - s0 < 2:
                    continue
                gh, gi = idh_s[s0:s1], ids_s[s0:s1]
                um = np.r_[True, gh[1:] != gh[:-1]]
                gi, gh, gg = gi[um], gh[um], gr_s[s0:s1][um]
                n = len(gi)
                if n < 2:
                    continue
                if n > max_bucket:
                    gi, gh, gg, n = gi[:max_bucket], gh[:max_bucket], gg[:max_bucket], max_bucket
                memo = (int(np.bitwise_xor.reduce(gh)) << 8) ^ n
                if memo in seen:
                    continue
                seen.add(memo)
                sets = [set(np.frombuffer(b, dtype=np.uint64).tolist()) for b in gg]
                for i in range(n):
                    for j in range(i + 1, n):
                        union = len(sets[i] | sets[j])
                        jac = len(sets[i] & sets[j]) / union if union else 0.0
                        if jac >= threshold:
                            a, b = (gi[i], gi[j]) if gi[i] < gi[j] else (gi[j], gi[i])
                            rows.append((a, b, jac))
        return _pairs_df(rows, "jaccard", "float64",
                         id_dtype=shard["doc_id"].dtype if len(shard) else "int64")

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
        bmat = _normalize(fixed_dim_matrix(batch[vec_col]))
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


class _LshSignStage:
    """Actor-pool stage for multi-table hyperplane LSH: the ``tables`` ×
    ``planes`` projection matrices are drawn ONCE per actor in ``__init__``
    (deterministic seed), not per batch. Emits one row per (vector, table):
    combined bucket key + normalized vector bytes."""

    def __init__(self, dim: int, vec_col: str, id_col: str,
                 planes: int, tables: int, seed: int):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((tables, dim, planes)).astype(np.float32)
        self.vec_col, self.id_col = vec_col, id_col
        self.planes, self.tables = planes, tables
        self._pow2 = 1 << np.arange(planes, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(fixed_dim_matrix(batch[self.vec_col]))
        n = len(vecs)
        keys = np.empty((self.tables, n), dtype=np.int64)
        for t in range(self.tables):
            bits = (vecs @ self.proj[t]) > 0
            keys[t] = bits.dot(self._pow2) + (t << self.planes)
        idx = np.tile(np.arange(n), self.tables)
        vec_bytes = np.fromiter((v.tobytes() for v in vecs), dtype=object, count=n)
        return pa.table(
            {
                "vec_id": batch[self.id_col].take(pa.array(idx)),
                "bucket": pa.array(keys.reshape(-1), type=pa.int64()),
                "vec": pa.array(np.tile(vec_bytes, self.tables), type=pa.binary()),
            }
        )


def embedding_lsh_neardup_pairs(ds, *, tau: float = 0.9, planes: int = 8,
                                tables: int = 8, vec_col: str = "embedding",
                                id_col: str = "vec_id", seed: int = 31,
                                max_bucket: int = 512, concurrency: int = 8):
    """Scale path for embedding near-dup: multi-table random-hyperplane LSH
    bucketing, exact cosine verify within buckets, pair dedup across tables.
    One groupby shuffle over (bucket, id, vector) × ``tables`` plus a tiny
    pair-dedup shuffle; no driver-side materialization, no all-pairs pass.

    Recall per pair at angle θ is ``1-(1-(1-θ/π)^planes)^tables``: pick
    more planes / fewer tables for high tau (true near-dups), fewer planes /
    more tables to chase a low-tau tail. Emitted pairs are always exact
    (soundness holds regardless of parameters); ``max_bucket`` caps
    degenerate buckets and is the only recall-losing truncation."""
    # probe the vector dimension from one row (list schemas don't carry
    # lengths); a 1-row take, not a materialization
    first = ds.limit(1).take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0])

    # instance => task pool (state = one small hyperplane matrix; same
    # adjudication as MinHashStage)
    del concurrency
    banded = ds.map_batches(
        _LshSignStage(dim=dim, vec_col=vec_col, id_col=id_col,
                      planes=planes, tables=tables, seed=seed),
        batch_format="pyarrow",
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id").head(max_bucket)
        rows = []
        if len(g) >= 2:
            ids = g["vec_id"].to_numpy()
            mat = np.frombuffer(b"".join(g["vec"]), dtype=np.float32).reshape(len(g), -1)
            scores = mat @ mat.T
            iu, ju = np.triu_indices(len(g), k=1)
            hit = scores[iu, ju] >= tau
            rows = [(ids[i], ids[j], float(scores[i, j]))
                    for i, j in zip(iu[hit], ju[hit])]
        out = _pairs_df(rows, "cosine", "float64",
                        id_dtype=g["vec_id"].dtype if len(g) else "int64")
        out["pair_shard"] = (
            pd.util.hash_pandas_object(out["doc_a"].astype(str) + "|" + out["doc_b"].astype(str),
                                       index=False) % 64
        ).astype("int64") if len(out) else pd.Series([], dtype="int64")
        return out

    pairs = banded.groupby("bucket").map_groups(verify, batch_format="pandas")
    return pairs.groupby("pair_shard").map_groups(
        lambda g: g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pair_shard"]),
        batch_format="pandas",
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
    mat = _normalize(fixed_dim_matrix(tbl[vec_col]))
    order = np.argsort(ids, kind="stable")
    return mat[order], ids[order]


# ----------------------------------------------------- duplicate spans --


def _hash_strings(arr: pa.Array | pa.ChunkedArray, kernel: str) -> pa.Array:
    """Hex hash of each string — a thin delegate to ``sampling._hash_col``
    so the md5-vs-xx64 kernel dispatch lives in exactly one place."""
    from geomesa_nifi_ray.sampling import _hash_col

    return _hash_col(pa.table({"v": arr}), "v", "", kernel)


def duplicate_spans(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 8, kernel: str = "md5",
                    max_bucket: int | None = None):
    """Exact duplicate-SPAN detection: every k-token window whose exact
    token sequence appears in >= 2 distinct documents — the
    substring-level dedup tier (cf. Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"), below the doc-level
    tiers (exact / MinHash / SimHash / n-gram Jaccard) this module
    already has. Output rows ``(id_col, pos, shingle_hash)``: ``pos`` is
    the 1-based token index of the window start, so a scrubber can mask
    token ranges ``[pos, pos+k)`` directly.

    Tokenization is THE corpus whitespace rule (``\\S+``, matching
    ``q_token_stats_documents``); windows never cross documents; a doc
    shorter than ``k`` tokens contributes nothing; within-doc repeats
    alone do NOT flag a span (that is ``repetition_documents``' job) —
    the 2-doc threshold is on DISTINCT documents, exactly the SQL
    oracle's ``HAVING count(DISTINCT doc_id) >= 2``.

    Scale shape: the per-batch stage is fully vectorized (one RE2 split,
    numpy window indexing, one ``binary_join_element_wise`` over k
    shifted takes) and emits (hash, id, pos) rows — ~50 B/token, never
    the text. The one exchange groups by a 64-way COARSENED shard of the
    hash (the same pattern as ``MinHashStage``: per-shingle groups would
    pay one Python ``map_groups`` dispatch per distinct shingle — ~one
    per corpus token); within a shard the >=2-distinct-docs rule is one
    vectorized sort + run-boundary scan over all its shingles at once.
    The exchange is inherently O(total tokens); that is the honest cost
    of EXACT substring dedup without a suffix array (Lee et al.'s
    construction), and the reason the doc-level tiers exist for the
    first pass. ``max_bucket`` (scale opt-in, default off = oracle-exact)
    drops degenerate shingle buckets (site boilerplate repeated across
    millions of pages) — those spans are flagged-by-construction anyway;
    dropping them loses only their position lists. At 100 TB run with
    ``kernel="xx64"`` (no per-row Python) and a ``max_bucket`` cap.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if kernel not in ("md5", "xx64"):
        raise ValueError(f"unknown span hash kernel {kernel!r}")

    def spans(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                          "pos": pa.array([], pa.int64()),
                          "shingle_hash": pa.array([], pa.string()),
                          "_shard": pa.array([], pa.int32())})
        t = t.filter(pc.is_valid(t[text_col]))
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(t[text_col], r"\s+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty).combine_chunks()
        par = parents.filter(nonempty).to_numpy(zero_copy_only=False)
        counts = np.bincount(par, minlength=t.num_rows)
        m = np.maximum(counts - k + 1, 0)          # windows per doc
        total = int(m.sum())
        if total == 0:
            return empty
        doc_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        cum_m = np.concatenate([[0], np.cumsum(m)])[:-1]
        pos0 = np.arange(total, dtype=np.int64) - np.repeat(cum_m, m)
        widx = np.repeat(doc_starts, m) + pos0     # window start in flat
        parts = [flat.take(pa.array(widx + j)) for j in range(k)]
        shingle = pc.binary_join_element_wise(*parts, " ") if k > 1 \
            else parts[0]
        win_doc = pa.array(np.repeat(np.arange(t.num_rows), m))
        hashes = _hash_strings(shingle, kernel)
        out = pa.table({
            id_col: t[id_col].take(win_doc),
            "pos": pa.array(pos0 + 1),
            "shingle_hash": hashes,
        })
        # 64-way coarsened shard from the first hex nibbles (uniform by
        # construction) — the exchange key; per-shingle logic stays
        # vectorized inside each shard task
        from geomesa_nifi_ray.sampling import _bucket_from_hex

        return out.append_column("_shard", _bucket_from_hex(hashes, 64))

    def multi_doc_only(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_shard"])
        if g.num_rows == 0:
            return g
        # one sort + run-boundary scan decides every shingle in the shard:
        # a shingle survives iff its run contains >= 2 distinct doc ids.
        # Null ids do NOT count toward distinctness (SQL count(DISTINCT)
        # ignores NULLs) but null-id rows of a surviving shingle are still
        # emitted — exactly the oracle's WHERE … IN (… HAVING) shape.
        g = g.sort_by([("shingle_hash", "ascending"), (id_col, "ascending")])
        hcodes = g["shingle_hash"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        ids = pc.cast(g[id_col], pa.string()).combine_chunks()
        didx = ids.dictionary_encode().indices
        valid = pc.is_valid(didx).to_numpy(zero_copy_only=False)
        dcodes = pc.fill_null(didx, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_run = np.r_[True, hcodes[1:] != hcodes[:-1]]
        run_ids = np.cumsum(new_run) - 1
        nruns = int(run_ids[-1]) + 1
        # distinct non-null docs per run = (run, doc) transitions over the
        # valid-id subsequence (order within a run is preserved by the take)
        vr, vd = run_ids[valid], dcodes[valid]
        if len(vr):
            new_pair = np.r_[True, (vr[1:] != vr[:-1]) | (vd[1:] != vd[:-1])]
            distinct = np.bincount(vr[new_pair], minlength=nruns)
        else:
            distinct = np.zeros(nruns, dtype=np.int64)
        keep = distinct[run_ids] >= 2
        if max_bucket is not None:
            sizes = np.bincount(run_ids, minlength=nruns)
            keep &= sizes[run_ids] <= max_bucket
        return g.filter(pa.array(keep))

    return (
        ds.map_batches(spans, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(multi_doc_only, batch_format="pyarrow")
    )


def duplicate_span_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                         k: int = 8, kernel: str = "md5",
                         max_bucket: int | None = None):
    """Per-document duplicated-token footprint: for each doc with at least
    one flagged span (see :func:`duplicate_spans`), the number of DISTINCT
    token positions covered by the union of its flagged ``[pos, pos+k)``
    windows — the "how much of this doc would span-scrubbing remove"
    number that decides scrub-vs-drop. Same cost envelope as
    ``duplicate_spans`` plus one O(flagged spans) exchange, coarsened to
    64 doc-shards (per-doc ``map_groups`` dispatch would pay one Python
    call per flagged document); the interval union is one vectorized
    segmented sweep per shard (windows share width k, so union length =
    sum(min(gap, k)) + k over sorted starts, per doc run). Null-id rows
    are excluded — a per-document footprint for an unidentifiable
    document is meaningless (``duplicate_spans`` itself still emits
    them)."""
    from geomesa_nifi_ray.sampling import _bucket_from_hex

    spans = duplicate_spans(ds, id_col=id_col, text_col=text_col, k=k,
                            kernel=kernel, max_bucket=max_bucket)

    def shard(t: pa.Table) -> pa.Table:
        # shard on the hex hash of the id — uniform regardless of id
        # type; the CALLER's kernel, so the md5 oracle tier never drags
        # in the xx64 path's polars dependency
        t = t.filter(pc.is_valid(t[id_col]))
        ids = _hash_strings(pc.cast(t[id_col], pa.string()), kernel)
        return t.append_column("_dshard", _bucket_from_hex(ids, 64))

    def union_len(g: pa.Table) -> pa.Table:
        out_schema = pa.schema([g.schema.field(id_col),
                                pa.field("dup_tokens", pa.int64())])
        if g.num_rows == 0:
            return out_schema.empty_table()
        g = g.sort_by([(id_col, "ascending"), ("pos", "ascending")])
        dcodes = pc.cast(g[id_col], pa.string()).combine_chunks() \
            .dictionary_encode().indices.to_numpy(zero_copy_only=False)
        pos = g["pos"].to_numpy(zero_copy_only=False)
        new_run = np.r_[True, dcodes[1:] != dcodes[:-1]]
        run_ids = np.cumsum(new_run) - 1
        nruns = int(run_ids[-1]) + 1
        # (doc, pos) pairs are unique by construction, so within a run the
        # sorted gaps are positive; union = sum(min(gap, k)) + k per run
        gaps = np.minimum(pos[1:] - pos[:-1], k)
        covered = np.full(nruns, k, dtype=np.int64)
        inrun = ~new_run[1:]
        np.add.at(covered, run_ids[1:][inrun], gaps[inrun])
        firsts = np.flatnonzero(new_run)
        return pa.table({
            id_col: g[id_col].take(pa.array(firsts)),
            "dup_tokens": pa.array(covered),
        })

    return (spans.map_batches(shard, batch_format="pyarrow")
            .groupby("_dshard")
            .map_groups(lambda t: union_len(t.drop_columns(["_dshard"])),
                        batch_format="pyarrow"))

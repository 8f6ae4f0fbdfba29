"""Deterministic content hashing and key-bucket assignment.

Content hash is the analog of the reference's MurmurHash3 content-hash
feature IDs (``GetGeoMesaKafkaRecord.scala:458-476``): a hash over the key
plus all attributes so that replayed/duplicate change events collapse
idempotently at the keyed store. We use md5-hex so the DuckDB oracle can
reproduce it exactly in SQL::

    md5(url || chr(31) || CAST(epoch_us(warc_ts) AS VARCHAR)
            || chr(31) || text || chr(31) || lang)

Bucket assignment must be stable across runs, processes and cluster sizes
(SURVEY.md §7.5 "Stable partitioning across cluster sizes"): crc32 of the
utf-8 key bytes modulo a table-fixed bucket count P recorded in the lake's
``_table.json``. Python's builtin ``hash`` is salted per process and MUST
NOT be used.

Pluggable hash kernels (round 3): the content-hash kernel is selectable
per table (``_table.json: content_hash_kernel``):

- ``md5`` (default) — per-row C md5, 16-byte hex; DuckDB-oracle
  reproducible. Measured 2.6 us/row on ~1 KB payloads (~6% of convert
  CPU), so it is a modest, not dominant, cost.
- ``xx64`` — vectorized 64-bit hash via polars' Rust hash kernel over the
  same ``\\x1f``-joined payload string, hex-encoded with a numpy nibble
  LUT (no per-row Python). Measured 1.55 us/row (1.7x md5). Deterministic
  across processes and runs for a fixed polars version; the kernel name is
  stamped in ``_table.json`` at creation, so a library upgrade that
  changed hash values would be a detectable schema-level event, exactly
  like ``TEXT_KERNEL_VERSION``. Not SQL-reproducible — oracle-checked
  tables keep md5.

A fully-numpy polynomial row hash (prefix-sum/cumprod over the flat
buffer) was measured at 25 us/row — uint64 cumprod has no SIMD path — and
rejected.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HASH_SEP = "\x1f"  # ASCII unit separator; chr(31) in SQL

CONTENT_HASH_KERNELS = ("md5", "xx64")

_HEX_LUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _hex16(vals: np.ndarray) -> pa.Array:
    """uint64 -> 16-char lowercase hex string array, fully vectorized."""
    n = len(vals)
    shifts = np.arange(60, -1, -4, dtype=np.uint64)          # 16 nibbles, MSB first
    nibbles = (vals[:, None] >> shifts[None, :]) & np.uint64(0xF)
    data = _HEX_LUT[nibbles.astype(np.uint8)].reshape(-1)
    offsets = np.arange(0, 16 * (n + 1), 16, dtype=np.int64)
    return pa.Array.from_buffers(
        pa.large_string(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    ).cast(pa.string())


def _joined_payload(batch: pa.Table, url_col: str, ts_col: str,
                    text_col: str, lang_col: str) -> pa.Array:
    """The ``url SEP epoch_us SEP text SEP lang`` payload column (nulls ->
    ''), built with Arrow kernels only."""
    u = batch[url_col].combine_chunks() if isinstance(batch[url_col], pa.ChunkedArray) else batch[url_col]
    ts = pc.cast(pc.cast(batch[ts_col], pa.int64()), pa.string())
    x = pc.cast(pc.fill_null(batch[text_col], ""), pa.string())
    l = pc.fill_null(batch[lang_col], "")
    parts = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in (u, ts, x, l)]
    joined = pc.binary_join_element_wise(*parts, HASH_SEP)
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return joined


def content_hash_xx64(batch: pa.Table, url_col: str = "url",
                      ts_col: str = "warc_ts", text_col: str = "text",
                      lang_col: str = "lang") -> pa.Array:
    """Vectorized 64-bit content hash (polars Rust kernel), hex-encoded.
    Same payload bytes as the md5 kernel; 16 hex chars instead of 32."""
    import polars as pl

    joined = _joined_payload(batch, url_col, ts_col, text_col, lang_col)
    h = pl.from_arrow(joined).hash(seed=0).to_numpy().astype(np.uint64)
    return _hex16(h)


def content_hash_generic(batch: pa.Table, hash_cols: list[str],
                         kernel: str = "md5") -> pa.Array:
    """Content hash over arbitrary columns (``\\x1f``-joined string casts,
    nulls -> ''). md5 keeps the DuckDB-oracle form ``md5(c1 || chr(31) ||
    c2 …)``; xx64 is the vectorized scale kernel (module docstring)."""
    if kernel not in CONTENT_HASH_KERNELS:
        raise ValueError(f"unknown content hash kernel {kernel!r}; "
                         f"supported: {CONTENT_HASH_KERNELS}")

    def _is_bin(t: pa.DataType) -> bool:
        return (pa.types.is_binary(t) or pa.types.is_large_binary(t)
                or pa.types.is_fixed_size_binary(t))

    has_bin = any(_is_bin(batch[c].type) for c in hash_cols)
    if has_bin:
        # binary hash columns cannot round-trip through a UTF-8 string
        # cast (arbitrary bytes are legal key material); join in BINARY
        # space instead — non-binary columns keep their string-cast form,
        # utf8-encoded, so their payload bytes are unchanged. Oracle form:
        # md5(c1::BLOB || '\\x1f'::BLOB || ...) in DuckDB.
        parts = [pc.cast(batch[c] if _is_bin(batch[c].type)
                         else pc.cast(batch[c], pa.string()), pa.binary())
                 for c in hash_cols]
        sep: bytes | str = HASH_SEP.encode()
        empty: bytes | str = b""
    else:
        parts = [pc.cast(batch[c], pa.string()) for c in hash_cols]
        sep, empty = HASH_SEP, ""
    parts = [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in parts]
    # a null in ANY hash column keeps the hash null (join's emit_null
    # default) — matching the established generic-convert semantics
    joined = (pc.binary_join_element_wise(*parts, sep)
              if len(parts) > 1 else parts[0])
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    if kernel == "xx64":
        import polars as pl

        null_mask = pc.is_null(joined)
        h = pl.from_arrow(pc.fill_null(joined, empty)).hash(seed=0) \
            .to_numpy().astype(np.uint64)
        hexed = _hex16(h)
        if joined.null_count:
            hexed = pc.if_else(null_mask, pa.nulls(len(hexed), pa.string()),
                               hexed)
        return hexed
    out = [None if v is None else
           hashlib.md5(v if isinstance(v, bytes) else v.encode("utf-8"))
           .hexdigest()
           for v in joined.to_pylist()]
    return pa.array(out, type=pa.string())


def kernel_fingerprint(kernel: str) -> str | None:
    """Environment fingerprint of a content-hash kernel: the kernel's own
    hash of a fixed sentinel payload. md5 is standardized, so it needs no
    fingerprint (returns None). xx64 rides on polars' hash kernel, which
    polars documents as unstable across versions — so lakes created with
    xx64 stamp this fingerprint in ``_table.json`` at create time and
    :meth:`LakeTable.load` verifies it, failing loudly if a library
    upgrade changed hash values (instead of silently diverging epoch
    digests). Behavior-based, so polars upgrades that DON'T change the
    hash keep working."""
    if kernel != "xx64":
        return None
    sentinel = pa.table(
        {"s": pa.array(["geomesa-nifi-ray/xx64-fingerprint/v1"])})
    s_fp = content_hash_generic(sentinel, ["s"], kernel="xx64")[0].as_py()
    # the binary hash path rides a SEPARATE polars dtype code path (Binary
    # vs Utf8 — equal today, but each could change independently across
    # polars versions), so binary-keyed xx64 tables need their own
    # behavior probe. Non-UTF8 bytes make the sentinel unreachable via the
    # string path.
    bin_sentinel = pa.table({"b": pa.array(
        [b"geomesa-nifi-ray/xx64-fingerprint/bin/v2\x00\xff\x80"],
        pa.binary())})
    b_fp = content_hash_generic(bin_sentinel, ["b"], kernel="xx64")[0].as_py()
    return f"{s_fp}:{b_fp}"


def content_hash_rows(
    urls: list[str],
    ts_us: np.ndarray,
    texts: list[str | None],
    langs: list[str | None],
) -> list[str]:
    """md5 hex over url, epoch-microseconds, text, lang (nulls -> '')."""
    sep = HASH_SEP
    out = []
    for u, t, x, l in zip(urls, ts_us, texts, langs):
        payload = f"{u}{sep}{int(t)}{sep}{x if x is not None else ''}{sep}{l if l is not None else ''}"
        out.append(hashlib.md5(payload.encode("utf-8")).hexdigest())
    return out


def bucket_ids(urls: list[str], num_buckets: int) -> np.ndarray:
    """crc32(url) % P — process-independent, cluster-size-independent."""
    crc = zlib.crc32
    return np.fromiter(
        (crc(u.encode("utf-8")) % num_buckets for u in urls),
        dtype=np.int32,
        count=len(urls),
    )


def add_hash_and_bucket(
    batch: pa.Table,
    num_buckets: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    lang_col: str = "lang",
    kernel: str = "md5",
) -> pa.Table:
    """Append ``content_hash`` and ``bucket`` columns to an Arrow batch.
    ``kernel`` selects the content-hash implementation (module docstring)."""
    if kernel not in CONTENT_HASH_KERNELS:
        raise ValueError(f"unknown content hash kernel {kernel!r}; "
                         f"supported: {CONTENT_HASH_KERNELS}")
    urls = batch[url_col].to_pylist()
    if kernel == "xx64":
        hash_arr = content_hash_xx64(batch, url_col, ts_col, text_col, lang_col)
    else:
        ts_us = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        langs = batch[lang_col].to_pylist()
        hash_arr = pa.array(
            content_hash_rows(urls, ts_us, texts, langs), type=pa.string()
        )
    buckets = bucket_ids(urls, num_buckets)
    batch = batch.append_column("content_hash", hash_arr)
    batch = batch.append_column("bucket", pa.array(buckets, type=pa.int32()))
    return batch


def stable_crc32(value: str) -> int:
    return zlib.crc32(value.encode("utf-8"))


def digest_of_hashes(hashes: list[str]) -> str:
    """Order-insensitive digest of a set of row content hashes (per-bucket
    lineage digest recorded in the epoch manifest)."""
    acc = hashlib.md5()
    for h in sorted(hashes):
        acc.update(h.encode("ascii"))
    return acc.hexdigest()

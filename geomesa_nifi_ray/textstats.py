"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting — the per-document stages of a training-data
pipeline, each a vectorized ``map_batches`` kernel (stopword sets / regexes
compiled once per actor in ``__init__``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geomesa_nifi_ray.text import fingerprints_np

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "por", "para", "con", "que"},
}

_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")
_PUNCT_RE = re.compile(r"[.!?,;:]")
_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")


class LangIdStage:
    """Heuristic language ID: CJK character ratio first, else the language
    whose stopword set covers the most tokens. Deterministic; ties resolve
    alphabetically. 'und' when nothing matches."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def classify(self, text: str | None) -> str:
        if not text:
            return "und"
        if len(_CJK_RE.findall(text[:2000])) > 0.05 * min(len(text), 2000):
            return "zh"
        words = [w.lower() for w in _WORD_RE.findall(text[:4000])]
        if not words:
            return "und"
        best_lang, best = "und", 0
        for lang in sorted(self.profiles):
            hits = sum(1 for w in words if w in self.profiles[lang])
            if hits > best:
                best_lang, best = lang, hits
        return best_lang if best >= max(1, len(words) // 50) else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


class QualityStage:
    """Quality-signal columns: char/token counts, punctuation density,
    stopword ratio, mean word length, alpha ratio, and a [0,1] composite."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.en_stop = _STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, np.int64)
        n_tokens = np.zeros(n, np.int64)
        punct_ratio = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        mean_word_len = np.zeros(n, np.float64)
        alpha_ratio = np.zeros(n, np.float64)
        for i, t in enumerate(texts):
            if not t:
                continue
            n_chars[i] = len(t)
            toks = t.split()
            n_tokens[i] = len(toks)
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / len(t)
            alpha = sum(1 for c in t if c.isalpha())
            alpha_ratio[i] = alpha / len(t)
            if toks:
                low = [w.lower() for w in toks]
                stop_ratio[i] = sum(1 for w in low if w in self.en_stop) / len(toks)
                mean_word_len[i] = sum(len(w) for w in toks) / len(toks)
        score = np.clip(
            0.3 * np.clip(n_tokens / 100.0, 0, 1)
            + 0.3 * alpha_ratio
            + 0.2 * np.clip(stop_ratio / 0.4, 0, 1)
            + 0.2 * np.clip(1 - np.abs(mean_word_len - 5) / 5, 0, 1),
            0,
            1,
        )
        out = batch
        for name, arr, typ in [
            ("n_chars_q", n_chars, pa.int64()),
            ("n_tokens", n_tokens, pa.int64()),
            ("punct_ratio", punct_ratio, pa.float64()),
            ("stopword_ratio", stop_ratio, pa.float64()),
            ("mean_word_len", mean_word_len, pa.float64()),
            ("alpha_ratio", alpha_ratio, pa.float64()),
            ("quality_score", score, pa.float64()),
        ]:
            out = out.append_column(name, pa.array(arr, type=typ))
        return out


def add_token_counts(ds, text_col: str = "text"):
    """Whitespace + BPE-ish token counts per document — pure Arrow RE2
    kernels (`pc.count_substring_regex`), no Python row loop."""

    def stage(batch: pa.Table) -> pa.Table:
        ws = pc.cast(pc.count_substring_regex(batch[text_col], r"\S+"), pa.int64())
        bp = pc.cast(
            pc.count_substring_regex(batch[text_col], r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"),
            pa.int64(),
        )
        return batch.append_column("ws_tokens", ws).append_column("bpe_tokens", bp)

    return ds.map_batches(stage, batch_format="pyarrow")


def add_fingerprint(ds, text_col: str = "text", window: int = 16):
    """Rolling-hash document fingerprint (min window hash)."""

    def stage(batch: pa.Table) -> pa.Table:
        fps = fingerprints_np(batch[text_col].to_pylist(), window)
        return batch.append_column("fingerprint", pa.array(fps, type=pa.int64()))

    return ds.map_batches(stage, batch_format="pyarrow")


def _blocklist_pattern(snippets) -> str:
    """One RE2 alternation of literal snippets. RE2 compiles a large
    literal alternation into a DFA/prefilter (its Aho-Corasick analog), so
    matching is one automaton pass per value — O(text bytes), independent
    of the snippet count — instead of one `match_substring` scan per
    snippet. Control characters are re-escaped as \\n/\\t/\\r sequences
    (re.escape leaves them as backslash+raw-byte, which RE2 rejects).
    Sorted for determinism; order can't change a boolean match."""
    import re as _re

    parts = []
    for s in sorted(set(snippets)):
        p = _re.escape(s)
        parts.append(p.replace("\\\n", "\\n").replace("\\\t", "\\t")
                      .replace("\\\r", "\\r"))
    return "|".join(parts)


class ContaminationStage:
    """Benchmark-contamination screen: flag rows whose ``text`` contains
    ANY blocklist snippet. The pattern (possibly built from 10^4+ snippets)
    ships to each actor once via ``ray.put`` and is matched with a single
    vectorized ``match_substring_regex`` kernel per batch — ~O(rows) total,
    vs the naive per-snippet loop's O(snippets x rows) (measured in
    BASELINE.md "contamination screen"). Use as
    ``ds.map_batches(ContaminationStage(snippets), batch_format="pyarrow",
    zero_copy_batch=True)``; the instance holds only the broadcast ref, so
    pickling it into tasks is cheap."""

    def __init__(self, snippets, text_col: str = "text",
                 out_col: str = "contaminated"):
        import ray

        snippets = list(snippets)  # may be a one-shot iterator
        self.text_col = text_col
        self.out_col = out_col
        self.pattern_ref = ray.put(_blocklist_pattern(snippets))
        self.empty = not snippets

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        if self.empty:
            hit = pa.array([False] * t.num_rows, type=pa.bool_())
        else:
            hit = pc.fill_null(
                pc.match_substring_regex(t[self.text_col],
                                         ray.get(self.pattern_ref)),
                False,
            )
        return t.append_column(self.out_col, pc.cast(hit, pa.bool_()))

"""Text-analysis stages for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

These are the webtext analogues of the reference's per-record scoring /
classification transforms (`radiant/tasks/vcf/snv/germline/occurrence.py`
zygosity/transmission classification — lookup-table driven, per-record,
stateless). Stateful pieces (compiled regexes, stopword sets, language
profiles) live in callable-class ``__init__`` so they are built once per
actor, per the actor-pool idiom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deterministic and dependency-free (no external langid model in this
# container); precision is adequate for routing/filter decisions.
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "it", "with"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "que", "une", "pour"},
    "es": {"el", "la", "los", "que", "de", "es", "una", "por", "con", "para"},
    "ru": {"и", "в", "не", "на", "что", "это", "как", "по", "но", "из"},
    "zh": set(),  # CJK detected by codepoint range instead
}

_STOPWORDS_EN = _LANG_PROFILES["en"] | {"a", "an", "on", "at", "as", "by", "be"}


class TokenizeStage:
    """Whitespace tokenization + counts; BPE-ish split available via regex."""

    def __init__(self, text_col: str = "text", mode: str = "whitespace"):
        import re

        self.text_col = text_col
        self.mode = mode
        # GPT-2-style pre-tokenizer shape: word fragments / numbers / punct
        self.bpe_re = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        ws = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        n_ws = pc.list_value_length(ws)
        n_ws = pc.if_else(
            pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0),
            pa.scalar(0, type=pa.int32()),
            n_ws,
        )
        batch = batch.append_column("n_tokens_ws", pc.cast(n_ws, pa.int64()))
        if self.mode == "bpe":
            counts = [
                len(self.bpe_re.findall(t)) if t is not None else 0
                for t in text.to_pylist()
            ]
            batch = batch.append_column(
                "n_tokens_bpe", pa.array(counts, type=pa.int64())
            )
        return batch


class QualityScoreStage:
    """Length / word-count / stopword quality features. Counts are emitted
    as exact integers (numerator + denominator, never a pre-divided ratio)
    so a SQL oracle can reproduce them bit-for-bit; consumers derive
    ``stopword_ratio = n_stopwords / n_words`` downstream."""

    def __init__(self, text_col: str = "text", stopwords: set[str] | None = None):
        self.text_col = text_col
        self.stopwords = stopwords or _STOPWORDS_EN

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_chars, n_words, n_stop = [], [], []
        for t in batch.column(self.text_col).to_pylist():
            if t is None:
                n_chars.append(None)
                n_words.append(None)
                n_stop.append(None)
                continue
            toks = [w for w in t.split() if w]
            n_chars.append(len(t))
            n_words.append(len(toks))
            n_stop.append(sum(1 for w in toks if w.lower() in self.stopwords))
        batch = batch.append_column("n_chars_q", pa.array(n_chars, type=pa.int64()))
        batch = batch.append_column("n_words", pa.array(n_words, type=pa.int64()))
        batch = batch.append_column(
            "n_stopwords", pa.array(n_stop, type=pa.int64())
        )
        ratio = pc.if_else(
            pc.greater(pc.fill_null(batch.column("n_words"), 0), 0),
            pc.divide(
                pc.cast(batch.column("n_stopwords"), pa.float64()),
                pc.cast(pc.max_element_wise(batch.column("n_words"), 1), pa.float64()),
            ),
            pa.scalar(0.0),
        )
        return batch.append_column("stopword_ratio", ratio)


class LangIdStage:
    """Heuristic language ID: stopword-profile voting + CJK codepoint check.
    Profiles built once per actor (reference T1/T2 pattern: per-worker state
    resolved once, reused per record)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def _classify(self, t: str | None) -> str | None:
        if not t:
            return None
        cjk = sum(1 for ch in t[:200] if "一" <= ch <= "鿿")
        if cjk > len(t[:200]) * 0.2:
            return "zh"
        words = t.lower().split()[:100]
        if not words:
            return "und"
        best, best_n = "und", 0
        for lang, prof in self.profiles.items():
            n = sum(1 for w in words if w in prof)
            if n > best_n or (n == best_n and n > 0 and lang < best):
                best, best_n = lang, n
        return best if best_n > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(t) for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


class FingerprintStage:
    """Deterministic 64-bit rolling polynomial document fingerprint
    (content-identity hash usable for exact dedup / caching)."""

    MOD = (1 << 61) - 1
    BASE = 262_657

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def _fp(self, t: str | None) -> int | None:
        if t is None:
            return None
        h = 0
        for b in t.encode("utf-8"):
            h = (h * self.BASE + b + 1) % self.MOD
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self._fp(t) for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col, pa.array(fps, type=pa.int64()))

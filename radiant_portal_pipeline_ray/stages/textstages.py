"""Text-analysis stages for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

These are the webtext analogues of the reference's per-record scoring /
classification transforms (`radiant/tasks/vcf/snv/germline/occurrence.py`
zygosity/transmission classification — lookup-table driven, per-record,
stateless). Stateful pieces (compiled regexes, stopword sets, language
profiles) live in callable-class ``__init__`` so they are built once per
actor, per the actor-pool idiom.

All kernels are vectorized: `pyarrow.compute` split/lower/is_in +
``np.bincount`` per-doc folds. The only per-row loop left is the md5 call
in ``FingerprintStage`` (C-backed hashlib per document, no per-byte Python).
"""

from __future__ import annotations

import hashlib

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


def _split_tokens(text: pa.Array | pa.ChunkedArray):
    """Single-space split, empty tokens masked out — equals
    ``text.strip().split(' ')`` + empty filter (and the DuckDB oracle's
    ``list_filter(string_split(trim(text), ' '), x -> x <> '')``).

    Returns (flat tokens, parent row index per token, nonempty mask)."""
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    ne = np.asarray(
        pc.not_equal(flat, "").to_numpy(zero_copy_only=False), dtype=bool
    )
    return flat, parent, ne


class TokenizeStage:
    """Whitespace tokenization + counts; BPE-ish split available via regex."""

    BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

    def __init__(self, text_col: str = "text", mode: str = "whitespace"):
        self.text_col = text_col
        self.mode = mode

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
            # GPT-2-style pre-tokenizer shape: word fragments / numbers /
            # punct — non-overlapping match count, vectorized in RE2
            counts = pc.cast(
                pc.fill_null(
                    pc.count_substring_regex(text, self.BPE_PATTERN), 0
                ),
                pa.int64(),
            )
            counts = pc.if_else(pc.is_valid(text), counts, pa.scalar(0, pa.int64()))
            batch = batch.append_column("n_tokens_bpe", counts)
        return batch


def train_bpe_merges(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Deterministic byte-pair-encoding merge-table trainer (the classic
    Sennrich count-pairs/merge-top loop) over a small corpus. Driver-side
    utility for building REAL merges tables in tests and small vocab fits;
    at 100 TB a vocab is trained once offline and shipped to the stage, so
    this never sits on a hot path. Pre-tokens are ``TokenizeStage.BPE_PATTERN``
    matches; ties on pair frequency break lexicographically for determinism.
    """
    import re
    from collections import Counter

    pat = re.compile(TokenizeStage.BPE_PATTERN)
    words = Counter()
    for t in texts:
        if t:
            words.update(pat.findall(t))
    vocab = {tuple(w): c for w, c in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


class BpeEncodeStage:
    """REAL merges-table BPE token counting (the GPT-2 encode algorithm):
    pre-tokenize with ``TokenizeStage.BPE_PATTERN``, then repeatedly apply
    the lowest-rank merge from the table until no pair in the word is
    mergeable. This is the exercised version of the ``t_token_counts_bpe``
    pre-tokenizer count — same stage shape, real vocabulary semantics.

    Actor-pool idiom (reference T1/T2: per-worker state resolved once):
    the merge-rank dict is built in ``__init__`` — shipped once per actor /
    task closure — and an encode CACHE keyed by unique pre-token persists
    across batches within a worker, so Zipf-distributed text costs one merge
    loop per DISTINCT word per worker, not per occurrence. The per-row work
    is a C-backed ``re.findall`` + dict lookups.
    """

    def __init__(
        self,
        merges: list[tuple[str, str]],
        text_col: str = "text",
        out_col: str = "n_tokens_bpe_real",
    ):
        import re

        self.text_col = text_col
        self.out_col = out_col
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._pat = re.compile(TokenizeStage.BPE_PATTERN)
        self._cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        sym = list(word)
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i, pair in enumerate(zip(sym, sym[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            merged = sym[best_i] + sym[best_i + 1]
            # merge EVERY occurrence of the chosen pair (GPT-2 semantics)
            a, b = sym[best_i], sym[best_i + 1]
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        n = len(sym)
        if len(self._cache) < 1_000_000:  # bounded per-worker cache
            self._cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            None
            if t is None
            else sum(self._encode_len(w) for w in self._pat.findall(t))
            for t in batch.column(self.text_col).to_pylist()
        ]
        return batch.append_column(
            self.out_col, pa.array(counts, type=pa.int64())
        )


class QualityScoreStage:
    """Length / word-count / stopword quality features. Counts are emitted
    as exact integers (numerator + denominator, never a pre-divided ratio)
    so a SQL oracle can reproduce them bit-for-bit; consumers derive
    ``stopword_ratio = n_stopwords / n_words`` downstream."""

    def __init__(self, text_col: str = "text", stopwords: set[str] | None = None):
        self.text_col = text_col
        self.stopwords = stopwords or _STOPWORDS_EN
        self._stop_arr = pa.array(sorted(self.stopwords), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n = batch.num_rows
        valid = np.asarray(
            pc.is_valid(text).to_numpy(zero_copy_only=False), dtype=bool
        )
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())

        flat, parent, ne = _split_tokens(text)
        n_words_np = np.bincount(parent[ne], minlength=n)
        is_stop = np.asarray(
            pc.is_in(pc.utf8_lower(flat), value_set=self._stop_arr).to_numpy(
                zero_copy_only=False
            ),
            dtype=bool,
        )
        n_stop_np = np.bincount(parent[ne & is_stop], minlength=n)

        n_words = pa.array(n_words_np.astype(np.int64), mask=~valid)
        n_stop = pa.array(n_stop_np.astype(np.int64), mask=~valid)
        batch = batch.append_column("n_chars_q", n_chars)
        batch = batch.append_column("n_words", n_words)
        batch = batch.append_column("n_stopwords", n_stop)
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
    resolved once, reused per record). Fully vectorized; ties on vote count
    resolve to the alphabetically-first language; docs with no profile hits
    → ``'und'``; null/empty text → null.

    Matches the SQL oracle in pipelines/textops.py exactly: tokens are the
    first 100 nonempty single-space-split tokens of ``lower(text)``; the
    CJK check counts codepoints U+4E00..U+9FFF in the first 200 characters.
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = sorted(k for k, v in _LANG_PROFILES.items() if v)
        self._profiles = [
            pa.array(sorted(_LANG_PROFILES[k]), type=pa.string())
            for k in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n = batch.num_rows
        empty_or_null = pc.fill_null(
            pc.equal(pc.utf8_length(text), 0), True
        ).to_numpy(zero_copy_only=False)
        empty_or_null = np.asarray(empty_or_null, dtype=bool)

        head = pc.utf8_slice_codeunits(text, 0, 200)
        cjk = pc.fill_null(
            pc.count_substring_regex(head, "[一-鿿]"), 0
        ).to_numpy(zero_copy_only=False)
        head_len = pc.fill_null(pc.utf8_length(head), 0).to_numpy(
            zero_copy_only=False
        )
        is_zh = cjk > 0.2 * head_len

        flat, parent, ne = _split_tokens(pc.utf8_lower(text))
        T = len(parent)
        votes = np.zeros((n, len(self.langs)), dtype=np.int64)
        if T:
            # keep only the first 100 nonempty tokens of each doc
            cnt = np.bincount(parent, minlength=n)
            starts = np.minimum(
                np.concatenate([[0], np.cumsum(cnt)[:-1]]), T - 1
            )
            cum = np.cumsum(ne)
            base = cum[starts] - ne[starts]  # nonempty tokens before doc start
            rank = cum - 1 - base[parent]
            keep = ne & (rank < 100)
            for j, prof in enumerate(self._profiles):
                hit = np.asarray(
                    pc.is_in(flat, value_set=prof).to_numpy(
                        zero_copy_only=False
                    ),
                    dtype=bool,
                )
                votes[:, j] = np.bincount(parent[keep & hit], minlength=n)

        best_j = np.argmax(votes, axis=1)  # first max → alphabetical tie-break
        best_n = votes[np.arange(n), best_j]
        has_words = np.bincount(parent[ne], minlength=n) > 0

        langs_arr = np.array(self.langs, dtype=object)
        out = np.where(
            is_zh,
            "zh",
            np.where((best_n > 0) & has_words, langs_arr[best_j], "und"),
        ).astype(object)
        preds = pa.array(out, type=pa.string(), mask=empty_or_null)
        return batch.append_column(self.out_col, preds)


class FingerprintStage:
    """Deterministic md5 document fingerprint (content-identity hash usable
    for exact dedup / caching) — hex string, reproducible by any SQL
    engine's ``md5()``. Per-row hashlib call (C), no per-byte Python."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column(self.text_col).to_pylist()
        ]
        return batch.append_column(self.out_col, pa.array(fps, type=pa.string()))


# ---------------------------------------------------------------------------
# PII redaction. Every serious webtext training pipeline scrubs contact
# PII before the corpus ships (C4 / Dolma / FineWeb all carry an analogous
# stage). Pure vectorized map_batches — zero shuffle, so it runs at ingest
# scale at read throughput. Patterns are RE2 (pyarrow's regex engine),
# chosen to behave identically under DuckDB's RE2 so the operator is
# oracle-checkable end to end.
# ---------------------------------------------------------------------------

#: (name, RE2 pattern, replacement) — applied in order; email first so its
#: digits/dots are gone before the IP/phone passes scan the remainder.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phones", r"\b\d{3}-\d{4}\b", "[PHONE]"),
)


class PiiRedactStage:
    """Replace emails / IPv4 literals / short phone numbers with typed
    placeholder tokens and count each category (counts are taken pass by
    pass on the partially-redacted string, exactly like the sequential
    ``regexp_replace`` chain an SQL oracle runs)."""

    def __init__(self, text_col: str = "text", out_col: str = "redacted"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_col)
        for name, pat, repl in PII_PATTERNS:
            n = pc.count_substring_regex(s, pat)
            batch = batch.append_column(
                f"n_{name}", pc.cast(n, pa.int64())
            )
            s = pc.replace_substring_regex(s, pat, repl)
        return batch.append_column(self.out_col, s)

"""Deterministic, fully vectorized HTML → text extraction.

This is the engine's per-row invariant (BASELINE.json input_hint): for every
url, ``text`` in a committed snapshot MUST be byte-identical to
``extract_text(html)``. The implementation is pure ``pyarrow.compute``
(RE2 regexes + chained literal replaces), so it is deterministic across
processes, platforms and Ray workers — no environment-dependent parser.

Reference analogue: the stateless per-record normalization front-end
(`radiant/tasks/vcf/snv/common.py:38-56` — normalize chrom / build locus),
re-expressed as an Arrow-batch kernel instead of a per-row Python function.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# One alternation pass strips script/style bodies, comments and tags
# left-to-right in a single scan (alternative order matters: at a position
# where both a container body and a bare tag could match, the body wins).
# Single-scan semantics: the earliest-starting construct consumes its span,
# so e.g. a <script> opening INSIDE a comment is inert (the comment wins) —
# how a streaming tokenizer behaves. Unescape "&amp;" LAST so "&amp;lt;"
# decodes to "&lt;" (standard single-pass entity semantics).
_STRUCT_RE = (
    r"(?is)<script[^>]*>.*?</script>"
    r"|<style[^>]*>.*?</style>"
    r"|<!--.*?-->"
    r"|<[^>]*>"
)

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

try:  # polars' regex engine runs the structural pass ~30% faster than RE2;
    # byte-identical output on this pattern (leftmost-first alternation in
    # both engines; asserted by tests/test_text.py::test_struct_pass_engines)
    import polars as _pl
except ImportError:  # pragma: no cover - polars is a baked-in dependency
    _pl = None


def _strip_structural(s: pa.Array | pa.ChunkedArray):
    if _pl is not None:
        out = _pl.from_arrow(s).str.replace_all(_STRUCT_RE, " ").to_arrow()
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        if out.type != pa.string():
            out = out.cast(pa.string())
        return out
    return pc.replace_substring_regex(s, pattern=_STRUCT_RE, replacement=" ")


def extract_text(html: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """binary/string html column → extracted-text string column (null-safe).

    Null html (e.g. delete tombstones) yields null text.
    """
    s = html
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = pc.cast(s, pa.string())
    chunked_in = isinstance(s, pa.ChunkedArray)
    s = _strip_structural(s)
    # Entity decode only touches rows that still contain "&" after tag
    # stripping (href/attr ampersands are already gone) — typically a small
    # minority, so gather → 6 replaces on the subset → scatter beats six
    # full-column scans. Equivalent output either way.
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    mask = pc.fill_null(pc.match_substring(s, "&"), False)
    n_amp = pc.sum(mask).as_py() or 0
    if n_amp == len(s):
        for ent, rep in _ENTITIES:
            s = pc.replace_substring(s, pattern=ent, replacement=rep)
    elif n_amp:
        idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        sub = pc.take(s, pa.array(idx))
        for ent, rep in _ENTITIES:
            sub = pc.replace_substring(sub, pattern=ent, replacement=rep)
        s = pc.replace_with_mask(s, mask, sub)
    # Whitespace collapse + trim via split/join: byte-equivalent to the
    # obvious `\s+ → " "` regex on ASCII text but ~4x faster (the regex
    # kernel pays per-match overhead on every whitespace run; split/join is
    # one linear scan). utf8_trim afterwards also drops any UNICODE
    # whitespace left at the edges, matching the previous kernel.
    s = pc.binary_join(pc.ascii_split_whitespace(s), " ")
    s = pc.utf8_trim_whitespace(s)
    # keep the input's container type (callers may .combine_chunks())
    if chunked_in and isinstance(s, pa.Array):
        s = pa.chunked_array([s])
    return s


def extract_text_str(html: bytes | str) -> str:
    """Scalar convenience wrapper (tests / oracles)."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    return extract_text(pa.array([html], type=pa.binary()))[0].as_py()

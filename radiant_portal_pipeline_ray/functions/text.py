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


def extract_text(html: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """binary/string html column → extracted-text string column (null-safe).

    Null html (e.g. delete tombstones) yields null text.
    """
    s = html
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = pc.cast(s, pa.string())
    s = pc.replace_substring_regex(s, pattern=_STRUCT_RE, replacement=" ")
    for ent, rep in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=rep)
    # Whitespace collapse + trim via split/join: byte-equivalent to the
    # obvious `\s+ → " "` regex on ASCII text but ~4x faster (the regex
    # kernel pays per-match overhead on every whitespace run; split/join is
    # one linear scan). utf8_trim afterwards also drops any UNICODE
    # whitespace left at the edges, matching the previous kernel.
    s = pc.binary_join(pc.ascii_split_whitespace(s), " ")
    return pc.utf8_trim_whitespace(s)


def extract_text_str(html: bytes | str) -> str:
    """Scalar convenience wrapper (tests / oracles)."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    return extract_text(pa.array([html], type=pa.binary()))[0].as_py()

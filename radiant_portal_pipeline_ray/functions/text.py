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

# Order matters: strip script/style bodies before generic tag removal, and
# unescape "&amp;" LAST so "&amp;lt;" decodes to "&lt;" (standard single-pass
# entity semantics).
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"
_WS_RE = r"[\s]+"

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
    for pattern in (_SCRIPT_RE, _STYLE_RE, _COMMENT_RE, _TAG_RE):
        s = pc.replace_substring_regex(s, pattern=pattern, replacement=" ")
    for ent, rep in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=rep)
    s = pc.replace_substring_regex(s, pattern=_WS_RE, replacement=" ")
    return pc.utf8_trim_whitespace(s)


def extract_text_str(html: bytes | str) -> str:
    """Scalar convenience wrapper (tests / oracles)."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    return extract_text(pa.array([html], type=pa.binary()))[0].as_py()

"""Passage / n-gram kernels for corpus-level text dedup and decontamination.

Vectorized throughout: tokens come from one ``pyarrow.compute`` split, window
membership and per-doc ranks are numpy index arithmetic, and window strings
are built with O(width) vectorized object-array concatenations — no Python
loop over rows, tokens or windows. The only per-item Python is the C-backed
md5 over UNIQUE window strings (``stages/dedup.md5_hash64``'s discipline).

Shapes served:
- non-overlapping ``width``-word passages → MassiveText-style corpus-wide
  exact passage dedup (first occurrence by ``(doc_id, passage_no)`` wins),
- stride-1 sliding n-grams → benchmark decontamination (train docs that
  contain any eval-set n-gram), the classic train/test-overlap filter.

Reference analogue (shape, not domain): the reference's normalized-key
explode + first-wins grouping in its dedup import steps
(`radiant/tasks/vcf/snv/germline/variant.py` unique-variant keying).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from radiant_portal_pipeline_ray.stages.textstages import _split_tokens

#: passage_no / order packing: doc_id * 2^20 + passage_no must not collide
_MAX_WINDOWS_PER_DOC = 1 << 20


def _tokens_ranked(text: pa.Array | pa.ChunkedArray, n: int):
    """Nonempty single-space tokens in doc-major order.

    Returns (tokens: object ndarray, doc_row: int ndarray, rank-in-doc:
    int ndarray, tokens-per-doc: int ndarray of length n). Matches the SQL
    ``list_filter(string_split(trim(text), ' '), x -> x <> '')`` token
    stream (``_split_tokens`` contract)."""
    import pyarrow.compute as pc

    flat, parent, ne = _split_tokens(pc.utf8_trim_whitespace(text))
    toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)[ne]
    p = parent[ne]
    cnt = np.bincount(p, minlength=n)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    rank = np.arange(len(p), dtype=np.int64) - starts[p]
    return toks, p, rank, cnt


def _join_windows(mat: np.ndarray) -> np.ndarray:
    """(m, width) object matrix of tokens → m single-space-joined strings,
    via width-1 vectorized concatenations."""
    if mat.shape[0] == 0:
        return np.empty(0, dtype=object)
    out = mat[:, 0]
    for j in range(1, mat.shape[1]):
        out = out + " "
        out = out + mat[:, j]
    return out


def md5_u64_pair(strings: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Full 128-bit md5 per string as two uint64 columns (16 shuffle bytes
    instead of a 32-char hex string; collision-safe for exact dedup at any
    realistic corpus size). C-backed hashlib per row, no per-byte Python."""
    if len(strings) == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    buf = b"".join(hashlib.md5(s.encode("utf-8")).digest() for s in strings)
    m = np.frombuffer(buf, dtype=">u8").reshape(-1, 2).astype(np.uint64)
    return m[:, 0], m[:, 1]


def explode_fixed_passages(batch: pa.Table, width: int, text_col: str = "text") -> pa.Table:
    """1→N explode into NON-OVERLAPPING complete ``width``-word passages.

    Output (one row per passage occurrence, compact enough to shuffle):
    ``h_hi``/``h_lo`` — the 128-bit md5 of the passage text as two uint64
    columns, ``doc_id``, and ``okey`` — the packed global order
    ``doc_id * 2^20 + passage_no`` whose minimum per hash is the canonical
    first occurrence."""
    n = batch.num_rows
    text = batch.column(text_col)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    toks, p, rank, cnt = _tokens_ranked(text, n)

    chunk = rank // width
    keep = chunk < (cnt // width)[p]  # complete chunks only
    mat = toks[keep].reshape(-1, width)
    passages = _join_windows(mat)
    doc_row = p[keep][::width]
    passage_no = chunk[keep][::width]
    if passage_no.size and int(passage_no.max()) >= _MAX_WINDOWS_PER_DOC:
        raise ValueError(
            f"document has >= 2^20 passages ({int(passage_no.max()) + 1}); "
            "okey packing (doc_id * 2^20 + passage_no) would corrupt "
            "first-occurrence attribution — raise _MAX_WINDOWS_PER_DOC"
        )
    docs = doc_ids[doc_row]
    h_hi, h_lo = md5_u64_pair(passages)
    return pa.table(
        {
            "h_hi": pa.array(h_hi, type=pa.uint64()),
            "h_lo": pa.array(h_lo, type=pa.uint64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "okey": pa.array(
                docs * _MAX_WINDOWS_PER_DOC + passage_no, type=pa.int64()
            ),
        }
    )


def sliding_ngram_hashes(batch: pa.Table, width: int, text_col: str = "text") -> pa.Table:
    """1→N explode into stride-1 sliding ``width``-grams, emitted as
    SQL-reproducible 64-bit md5 hashes (first 8 md5 bytes, the
    ``md5_hash64`` convention) — one row per n-gram OCCURRENCE."""
    from radiant_portal_pipeline_ray.stages.dedup import md5_hash64

    n = batch.num_rows
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    toks, p, rank, cnt = _tokens_ranked(batch.column(text_col), n)

    T = len(toks)
    if T < width:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "g64": pa.array([], type=pa.uint64()),
            }
        )
    idx = np.arange(T - width + 1)
    valid = p[idx] == p[idx + width - 1]  # window stays inside one doc
    starts = idx[valid]
    mat = toks[starts[:, None] + np.arange(width)[None, :]]
    grams = _join_windows(mat)
    g64 = md5_hash64(pa.array(grams, type=pa.string())) if grams.size else np.empty(0, np.uint64)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[p[starts]], type=pa.int64()),
            "g64": pa.array(g64, type=pa.uint64()),
        }
    )


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality features, exact integers per doc:
    ``n_words``, ``n_distinct_words``, ``top_word_count`` (count of the
    most frequent word; NULL when the doc has no words), ``n_2grams``,
    ``n_distinct_2grams``. Exact-dyadic-free ints → bit-identical SQL
    oracle; consumers derive ratios downstream (same discipline as
    ``QualityScoreStage``)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    text = batch.column(text_col)
    valid = np.asarray(
        pc.is_valid(text).to_numpy(zero_copy_only=False), dtype=bool
    )
    toks, p, rank, cnt = _tokens_ranked(text, n)

    # distinct words + top-word count via dictionary-encode + packed keys
    tok_arr = pa.array(toks, type=pa.string())
    d = pc.dictionary_encode(tok_arr)
    tok_idx = np.asarray(d.indices.to_numpy(zero_copy_only=False), dtype=np.uint64)
    comb = (p.astype(np.uint64) << np.uint64(32)) | tok_idx
    uniq, counts = np.unique(comb, return_counts=True)
    udoc = (uniq >> np.uint64(32)).astype(np.int64)
    n_distinct = np.bincount(udoc, minlength=n)
    top = np.zeros(n, dtype=np.int64)
    np.maximum.at(top, udoc, counts)

    # bigrams: adjacent same-doc token pairs
    if len(toks) >= 2:
        adj = p[:-1] == p[1:]
        big = toks[:-1][adj] + " "
        big = big + toks[1:][adj]
        pbig = p[:-1][adj]
        n_2 = np.bincount(pbig, minlength=n)
        bd = pc.dictionary_encode(pa.array(big, type=pa.string()))
        bidx = np.asarray(bd.indices.to_numpy(zero_copy_only=False), dtype=np.uint64)
        bcomb = (pbig.astype(np.uint64) << np.uint64(32)) | bidx
        n_d2 = np.bincount(
            (np.unique(bcomb) >> np.uint64(32)).astype(np.int64), minlength=n
        )
    else:
        n_2 = np.zeros(n, dtype=np.int64)
        n_d2 = np.zeros(n, dtype=np.int64)

    has_words = cnt > 0
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(cnt.astype(np.int64), mask=~valid),
            "n_distinct_words": pa.array(n_distinct.astype(np.int64), mask=~valid),
            "top_word_count": pa.array(top, mask=~(valid & has_words)),
            "n_2grams": pa.array(n_2.astype(np.int64), mask=~valid),
            "n_distinct_2grams": pa.array(n_d2.astype(np.int64), mask=~valid),
        }
    )

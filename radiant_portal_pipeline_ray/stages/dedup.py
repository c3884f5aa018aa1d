"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators (north rule "beyond the reference"):
- exact: content-hash → hash-partitioned groupby → first per group
  (reference D4 shape: dedup-agg by composite key,
  `radiant/dags/sql/radiant/snv_consequence_filter_insert.sql`).
- MinHash+LSH: shingle → minhash sig per batch (vectorized numpy) →
  explode to (band, band_hash, doc) rows → groupby band bucket →
  candidate pairs → exact-Jaccard verify against broadcast shingle sets.
- SimHash: 64-bit sign-of-weighted-token-hash signature; near-dup =
  small Hamming distance within LSH chunks.
- n-gram Jaccard: exact pairwise verification with INTEGER threshold
  arithmetic (``den*inter >= num*union``) so engine and SQL oracle agree
  bit-for-bit.

All signature computation is per-batch (stateless or per-actor state);
the only shuffles are the band-bucket groupby (candidates) — never an
all-pairs cross join at scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles; docs shorter than k words have none (matches the
    SQL-oracle construction exactly)."""
    w = [t for t in text.strip().split(" ") if t]
    if len(w) < k:
        return []
    return [" ".join(w[i : i + k]) for i in range(len(w) - k + 1)]


def _hash64(s: str) -> np.uint64:
    return np.uint64(
        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    )


class MinHashStage:
    """Per-batch MinHash signatures. Permutation params derived from a fixed
    seed in ``__init__`` (once per actor)."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = shingle_k

    def signature(self, text: str | None) -> np.ndarray | None:
        if text is None:
            return None
        sh = _token_shingles(text, self.k)
        if not sh:
            return None
        hv = np.array([_hash64(s) for s in sh], dtype=np.uint64)
        # (a*h + b) mod p, min over shingles, vectorized over perms×shingles
        prod = (hv[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        arr = pa.array(
            [None if s is None else s.astype(np.int64).tolist() for s in sigs],
            type=pa.list_(pa.int64()),
        )
        return batch.append_column("minhash", arr)


def make_band_exploder(n_bands: int, rows_per_band: int, id_col: str = "doc_id"):
    """signature rows → (band, band_hash, id) rows; the groupby on
    (band, band_hash) is the LSH bucketing shuffle."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, bands, hashes = [], [], []
        id_vals = batch.column(id_col).to_pylist()
        for i, sig in enumerate(batch.column("minhash").to_pylist()):
            if sig is None:
                continue
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(n_bands):
                chunk = s[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(id_vals[i])
                bands.append(b)
                hashes.append(h)
        return pa.table(
            {
                id_col: pa.array(ids, type=batch.schema.field(id_col).type),
                "band": pa.array(bands, type=pa.int32()),
                "band_hash": pa.array(hashes, type=pa.string()),
            }
        )

    return explode


def candidate_pairs_from_buckets(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """One LSH bucket → all unordered id pairs (buckets are tiny by design)."""
    ids = sorted(set(group.column(id_col).to_pylist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table(
        {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
    )


class SimHashStage:
    """64-bit SimHash over whitespace tokens."""

    def __init__(self, text_col: str = "text", out_col: str = "simhash"):
        self.text_col = text_col
        self.out_col = out_col

    def simhash(self, text: str | None) -> int | None:
        if text is None:
            return None
        toks = [t for t in text.strip().split(" ") if t]
        if not toks:
            return None
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for t in toks:
            h = _hash64(t)  # np.uint64
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        return out - (1 << 64) if out >= (1 << 63) else out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self.simhash(t) for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col, pa.array(vals, type=pa.int64()))


def jaccard_exact_int(a: set, b: set) -> tuple[int, int]:
    """(intersection, union) sizes — integer-exact for threshold checks."""
    inter = len(a & b)
    return inter, len(a) + len(b) - inter


class JaccardVerifyStage:
    """Verify candidate (doc_a, doc_b) pairs against broadcast shingle sets;
    integer threshold: keep iff den*inter >= num*union."""

    def __init__(self, shingles_by_id: dict[int, frozenset], num: int, den: int, k: int = 3):
        self.sh = shingles_by_id
        self.num = num
        self.den = den

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep, inters, unions = [], [], []
        for a, b in zip(
            batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()
        ):
            sa, sb = self.sh.get(a), self.sh.get(b)
            if not sa or not sb:
                keep.append(False)
                inters.append(0)
                unions.append(0)
                continue
            inter, union = jaccard_exact_int(sa, sb)
            keep.append(self.den * inter >= self.num * union and union > 0)
            inters.append(inter)
            unions.append(union)
        out = batch.append_column("inter", pa.array(inters, type=pa.int64()))
        out = out.append_column("uni", pa.array(unions, type=pa.int64()))
        return out.filter(pa.array(keep))


def shingle_sets_from_table(t: pa.Table, k: int = 3) -> dict[int, frozenset]:
    out = {}
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        if text is not None:
            out[did] = frozenset(_token_shingles(text, k))
    return out

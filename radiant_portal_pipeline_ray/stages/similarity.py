"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: broadcast the (small) query matrix, numpy
  matmul per Arrow batch, per-batch top-k prune, final top-k merge — the
  baseline every ANN variant is checked against.
- LSH-bucketed variant (random-hyperplane signatures): candidates only
  probe vectors sharing a signature bucket — the scale path when the
  corpus is 10^10 rows (bucket groupby replaces the full scan).

Scores are also computed in QUANTIZED INTEGER space (round(x*1000) int64)
when exactness against a SQL oracle is required — integer dot products are
exact in both engines, so thresholds compare identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    lists = batch.column(col)
    flat = np.asarray(lists.combine_chunks().flatten(), dtype=np.float64)
    n = batch.num_rows
    return flat.reshape(n, -1)


class BruteForceTopK:
    """map_batches stage: per batch, cosine of every row against the
    broadcast query matrix; emits per-(query, batch) top-k rows. A final
    per-query top-k merge (tiny) finishes the job."""

    def __init__(
        self,
        queries: np.ndarray,
        query_ids: list[int],
        k: int = 10,
        margin: float = 0.0,
    ):
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        self.qn = qn
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        #: keep everything within ``margin`` of the per-batch kth score so a
        #: downstream round-then-rank (e.g. 6-dp oracle comparison) can never
        #: lose a row to the batch-local prune.
        self.margin = margin

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _emb_matrix(batch)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        S = self.qn @ En.T  # (Q, B)
        vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        k = min(self.k, S.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(S.shape[0]):
            kth = np.partition(-S[qi], k - 1)[k - 1]
            idx = np.flatnonzero(S[qi] >= -kth - self.margin)
            out_q.append(np.full(len(idx), self.qids[qi]))
            out_v.append(vec_ids[idx])
            out_s.append(S[qi][idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )


def finalize_topk(t: pa.Table, k: int, score_col: str = "cosine") -> pa.Table:
    """Merge per-batch partials → exact global top-k per query.
    Deterministic tie-break: (score desc, vec_id asc)."""
    import pyarrow.compute as pc

    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[
                ("query_id", "ascending"),
                (score_col, "descending"),
                ("vec_id", "ascending"),
            ],
        )
    ).combine_chunks()
    q = t.column("query_id").to_numpy(zero_copy_only=False)
    new_grp = np.empty(len(q), dtype=bool)
    if len(q):
        new_grp[0] = True
        new_grp[1:] = q[1:] != q[:-1]
        first = np.flatnonzero(new_grp)
        rank = np.arange(len(q)) - first[np.cumsum(new_grp) - 1]
        t = t.filter(pa.array(rank < k))
        t = t.append_column("rank", pa.array(rank[rank < k] + 1, type=pa.int64()))
    return t


class HyperplaneLSHStage:
    """MULTI-TABLE random-hyperplane LSH: ``n_tables`` independent
    ``n_planes``-bit signatures per vector; a pair is a candidate if it
    shares the bucket of ANY table (union-of-tables OR-amplification — a
    single table's recall collapses as the corpus grows; more tables trade
    shuffle volume for recall). Output: one row per (vector, table) with
    ``lsh_bucket = table_idx << n_planes | signature`` (single int64 key, so
    one groupby buckets all tables at once). Planes drawn once per actor
    from a fixed seed — identical across workers."""

    def __init__(
        self, dim: int, n_planes: int = 12, n_tables: int = 8, seed: int = 11
    ):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_planes, dim))
        self.n_planes = n_planes
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _emb_matrix(batch)
        n = len(E)
        weights = (np.int64(1) << np.arange(self.n_planes)).astype(np.int64)
        sigs = np.empty((n, self.n_tables), dtype=np.int64)
        for t in range(self.n_tables):
            bits = (E @ self.planes[t].T) > 0
            sigs[:, t] = bits.astype(np.int64) @ weights + (
                np.int64(t) << np.int64(self.n_planes)
            )
        idx = np.repeat(np.arange(n), self.n_tables)
        out = batch.take(pa.array(idx))
        return out.append_column(
            "lsh_bucket", pa.array(sigs.ravel(), type=pa.int64())
        )


def quantize_embeddings(batch: pa.Table, scale: int = 1000) -> pa.Table:
    """embedding → int64-quantized list (exact-arithmetic oracle domain)."""
    E = _emb_matrix(batch)
    Q = np.rint(E * scale).astype(np.int64)
    arr = pa.array(list(Q), type=pa.list_(pa.int64()))
    return batch.append_column("emb_q", arr)

"""Similarity-search queries over the ``embeddings`` table.

- ``sim_topk_cosine``: brute-force cosine top-k (broadcast query matrix,
  numpy matmul per batch, margin-safe per-batch prune, exact final merge).
  Scores are float64 rounded to 6 dp; the SQL oracle casts to DOUBLE before
  ``list_cosine_similarity`` so both sides agree to ~1e-16 before rounding.
- ``sim_neardup_pairs_q``: cosine-threshold near-dup pairs in QUANTIZED
  INTEGER arithmetic (round(x*1000) int64): float64 BLAS matmul is exact for
  these magnitudes (<2^53), the threshold 400·dot² ≥ 49·|a|²·|b|² is checked
  in arbitrary-precision ints — bit-identical to the HUGEINT SQL oracle.
- ``sim_ann_lsh``: random-hyperplane LSH bucketing — the 10^10-row path
  (candidates share a signature bucket; no full scan); rows-only, recall
  measured against brute force in pytest.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from radiant_portal_pipeline_ray.sources.io import read_parquet_clean

from radiant_portal_pipeline_ray.stages.similarity import (
    BruteForceTopK,
    HyperplaneLSHStage,
    _emb_matrix,
    finalize_topk,
)

QUERIES: dict = {}
N_QUERIES = 5
TOP_K = 10


def _register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _emb_ds(sf_dir: str):
    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


def _emb_table(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).combine_chunks()


# ---------------------------------------------------------------------------
@_register(
    "sim_topk_cosine",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ee
      FROM embeddings
    ), s AS (
      SELECT q.qid AS query_id, e.vec_id,
             ROUND(list_cosine_similarity(q.qe, e.ee), 6) AS cos_r
      FROM q, e WHERE e.vec_id <> q.qid
    )
    SELECT query_id, vec_id, cos_r,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cos_r DESC, vec_id) AS rank
    FROM s
    QUALIFY rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def sim_topk_cosine(sf_dir: str):
    t = _emb_table(sf_dir)
    qmask = pc.less(t.column("vec_id"), N_QUERIES)
    qt = t.filter(qmask)
    Q = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    qids = qt.column("vec_id").to_pylist()

    stage = BruteForceTopK(Q, qids, k=TOP_K, margin=1e-6)
    partials = _emb_ds(sf_dir).map_batches(stage, batch_format="pyarrow")
    merged = pa.Table.from_pylist(partials.take_all())
    merged = merged.filter(
        pc.not_equal(merged.column("query_id"), merged.column("vec_id"))
    )
    merged = merged.set_column(
        merged.schema.get_field_index("cosine"),
        pa.field("cos_r", pa.float64()),
        pc.round(merged.column("cosine"), ndigits=6),
    )
    return finalize_topk(merged, TOP_K, score_col="cos_r")


# ---------------------------------------------------------------------------
@_register(
    "sim_neardup_pairs_q",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(ROUND(x*1000) AS BIGINT)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             list_sum(list_transform(e, x -> CAST(x AS HUGEINT)*x)) AS nn
      FROM q
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(list_sum(list_transform(list_zip(a.e, b.e),
                p -> CAST(p[1] AS HUGEINT)*p[2])) AS BIGINT) AS dot_q
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE dot_q > 0
      AND 400 * CAST(dot_q AS HUGEINT) * dot_q >= 49 * a.nn * b.nn
    ORDER BY vec_a, vec_b
    """,
)
def sim_neardup_pairs_q(sf_dir: str):
    """Pairs with quantized cosine ≥ 0.35 (= 7/20, exact rational check)."""
    t = _emb_table(sf_dir)
    all_q = np.rint(
        np.array(t.column("embedding").to_pylist(), dtype=np.float64) * 1000
    )
    all_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    norms2 = (all_q * all_q).sum(axis=1)  # exact in float64 (< 2^53)

    def pairs(batch: pa.Table) -> pa.Table:
        E = np.rint(_emb_matrix(batch) * 1000)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        D = E @ all_q.T  # exact integer values in float64
        my_n2 = (E * E).sum(axis=1)
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            cand = np.flatnonzero(
                (all_ids > ids[i])
                & (D[i] > 0)
                & (400.0 * D[i] * D[i] >= 49.0 * my_n2[i] * norms2 * (1 - 1e-12))
            )
            for j in cand:  # exact integer confirmation
                d = int(D[i, j])
                if 400 * d * d >= 49 * int(my_n2[i]) * int(norms2[j]):
                    out_a.append(int(ids[i]))
                    out_b.append(int(all_ids[j]))
                    out_d.append(d)
        return pa.table(
            {
                "vec_a": pa.array(out_a, type=pa.int64()),
                "vec_b": pa.array(out_b, type=pa.int64()),
                "dot_q": pa.array(out_d, type=pa.int64()),
            }
        )

    return _emb_ds(sf_dir).map_batches(pairs, batch_format="pyarrow").sort(
        ["vec_a", "vec_b"]
    )


# ---------------------------------------------------------------------------
@_register("sim_ann_lsh", None)  # approximate — rows-only; recall in pytest
def sim_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate neighbors: vectors sharing a 12-bit
    hyperplane signature are candidate neighbors; emit per-bucket pairwise
    cosines ≥ 0.2. At 10^10 rows this is the only feasible shape — the
    bucket groupby replaces the all-pairs scan."""
    t0 = _emb_table(sf_dir)
    dim = len(t0.column("embedding")[0])
    ds = _emb_ds(sf_dir).map_batches(
        HyperplaneLSHStage(dim, n_planes=12), batch_format="pyarrow", concurrency=2
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        E = _emb_matrix(g)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-30)
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        S = En @ En.T
        a, b, c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= 0.2:
                    lo, hi = sorted((int(ids[i]), int(ids[j])))
                    a.append(lo)
                    b.append(hi)
                    c.append(round(float(S[i, j]), 6))
        return pa.table(
            {
                "vec_a": pa.array(a, type=pa.int64()),
                "vec_b": pa.array(b, type=pa.int64()),
                "cos_r": pa.array(c, type=pa.float64()),
            }
        )

    pairs = ds.groupby("lsh_bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return (
        pairs.groupby(["vec_a", "vec_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["vec_a", "vec_b"])
    )

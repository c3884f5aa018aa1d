"""Deduplication queries over the ``documents`` table.

- ``dd_exact``: content-hash partitioned exact dedup (reference D4 shape).
- ``dd_ngram_jaccard``: exact near-dup pairs via shared-shingle inverted
  index + integer-threshold verification (2·inter ≥ union ⇔ J ≥ 0.5);
  SQL oracle reproduces it bit-for-bit.
- ``dd_minhash_lsh``: MinHash(64)+LSH(16×4) banded candidates, then exact
  verification — the 10^10-scale path (no all-pairs anywhere); rows-only
  for the driver, recall-tested against ``dd_ngram_jaccard`` in pytest.
- ``dd_simhash``: 64-bit SimHash, candidates from 4×16-bit chunk buckets
  (hamming ≤ small ⇒ some chunk equal), verified by exact hamming ≤ 6.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Min, Sum

from radiant_portal_pipeline_ray.functions.hashing import sha256_hex_array
from radiant_portal_pipeline_ray.stages.dedup import (
    JaccardVerifyStage,
    MinHashStage,
    SimHashStage,
    _token_shingles,
    candidate_pairs_from_buckets,
    make_band_exploder,
    shingle_sets_from_table,
)

QUERIES: dict = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
@_register(
    "dd_exact",
    """
    SELECT MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text ORDER BY rep_doc_id
    """,
)
def dd_exact(sf_dir: str):
    """Exact dedup: sha256(text) → hash-partitioned groupby → min doc_id.
    The shuffle moves 64-byte hashes + ids, never the text payload."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def hash_and_combine(b: pa.Table) -> pa.Table:
        h = sha256_hex_array(b.column("text"))
        t = pa.table({"h": h, "doc_id": b.column("doc_id")})
        g = t.group_by("h").aggregate([("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["h", "rep_doc_id", "n_copies"])

    agg = (
        ds.map_batches(hash_and_combine, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("rep_doc_id", alias_name="rep_doc_id"),
            Sum("n_copies", alias_name="n_copies"),
        )
    )
    return (
        agg.select_columns(["rep_doc_id", "n_copies"])
        .map_batches(
            lambda b: pa.table(
                {
                    "rep_doc_id": pc.cast(b.column("rep_doc_id"), pa.int64()),
                    "n_copies": pc.cast(b.column("n_copies"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("rep_doc_id")
    )


# ---------------------------------------------------------------------------
_NGRAM_SQL = """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
      FROM w, UNNEST(range(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 3
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.inter, sa.n + sb.n - i.inter AS uni
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE 2 * i.inter >= sa.n + sb.n - i.inter
    ORDER BY doc_a, doc_b
"""


@_register("dd_ngram_jaccard", _NGRAM_SQL)
def dd_ngram_jaccard(sf_dir: str):
    """Exact 3-gram Jaccard ≥ 0.5 pairs. Candidates = docs sharing ≥1
    shingle (inverted-index groupby — exact, since J ≥ 0.5 ⇒ shared
    shingle); verify with integer arithmetic. The broadcast shingle-set dict
    is the small side; at 10^10 docs swap candidates to dd_minhash_lsh."""
    docs_t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    shingle_sets = shingle_sets_from_table(docs_t, k=3)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode_shingles(b: pa.Table) -> pa.Table:
        ids, sh = [], []
        for did, text in zip(
            b.column("doc_id").to_pylist(), b.column("text").to_pylist()
        ):
            for s in set(_token_shingles(text, 3)):
                ids.append(did)
                sh.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "s": pa.array(sh, type=pa.string()),
            }
        )

    pairs = (
        ds.map_batches(explode_shingles, batch_format="pyarrow")
        .groupby("s")
        .map_groups(
            lambda g: candidate_pairs_from_buckets(g, "doc_id"),
            batch_format="pyarrow",
        )
    )

    def dedup_pairs(b: pa.Table) -> pa.Table:
        return b.group_by(["doc_a", "doc_b"]).aggregate([])

    uniq_pairs = (
        pairs.map_batches(dedup_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    verified = uniq_pairs.map_batches(
        JaccardVerifyStage(shingle_sets, num=1, den=2),
        batch_format="pyarrow",
        concurrency=2,
    )
    return verified.select_columns(["doc_a", "doc_b", "inter", "uni"]).sort(
        ["doc_a", "doc_b"]
    )


# ---------------------------------------------------------------------------
@_register("dd_minhash_lsh", None)  # approximate candidates — rows-only
def dd_minhash_lsh(sf_dir: str):
    """MinHash(64 perms) + LSH banding(16 bands × 4 rows) near-dup pairs,
    exact-verified at J ≥ 0.5. Scale path: signatures per batch, ONE
    groupby on (band, band_hash), candidate pairs per bucket, verify."""
    docs_t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    shingle_sets = shingle_sets_from_table(docs_t, k=3)
    ds = _docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(
        MinHashStage(n_perm=64, shingle_k=3), batch_format="pyarrow", concurrency=2
    )
    buckets = sigs.map_batches(
        make_band_exploder(n_bands=16, rows_per_band=4), batch_format="pyarrow"
    )
    pairs = buckets.groupby(["band", "band_hash"]).map_groups(
        lambda g: candidate_pairs_from_buckets(g, "doc_id"),
        batch_format="pyarrow",
    )

    def dedup_pairs(b: pa.Table) -> pa.Table:
        return b.group_by(["doc_a", "doc_b"]).aggregate([])

    uniq = (
        pairs.map_batches(dedup_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    verified = uniq.map_batches(
        JaccardVerifyStage(shingle_sets, num=1, den=2),
        batch_format="pyarrow",
        concurrency=2,
    )
    return verified.select_columns(["doc_a", "doc_b", "inter", "uni"]).sort(
        ["doc_a", "doc_b"]
    )


# ---------------------------------------------------------------------------
@_register("dd_simhash", None)  # signature-distance dedup — rows-only
def dd_simhash(sf_dir: str):
    """64-bit SimHash near-dup: candidates share one of four 16-bit chunks
    (pigeonhole: hamming ≤ 3 guarantees a shared chunk), verified at
    hamming ≤ 6."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(SimHashStage(), batch_format="pyarrow", concurrency=2)

    def explode_chunks(b: pa.Table) -> pa.Table:
        ids, chunk_no, chunk_val, sim = [], [], [], []
        for did, s in zip(
            b.column("doc_id").to_pylist(), b.column("simhash").to_pylist()
        ):
            if s is None:
                continue
            u = s & 0xFFFFFFFFFFFFFFFF
            for c in range(4):
                ids.append(did)
                chunk_no.append(c)
                chunk_val.append((u >> (16 * c)) & 0xFFFF)
                sim.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "chunk_no": pa.array(chunk_no, type=pa.int32()),
                "chunk_val": pa.array(chunk_val, type=pa.int32()),
                "simhash": pa.array(sim, type=pa.int64()),
            }
        )

    buckets = sigs.map_batches(explode_chunks, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(g.column("doc_id").to_pylist(), g.column("simhash").to_pylist()))
        )
        a, b, ham = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= 6:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    ham.append(d)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(ham, type=pa.int64()),
            }
        )

    pairs = buckets.groupby(["chunk_no", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )

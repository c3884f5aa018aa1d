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

Scale shape (fixes the round-1 review findings):
- NO whole-corpus driver materialization anywhere: candidate verification
  uses shingle sets SEMI-FILTERED to the candidate doc ids (bounded by the
  candidate count, typically orders of magnitude below the corpus), shipped
  once via ``ray.put`` into a verify actor pool.
- Shingles shuffle as int64 hashes (8 bytes), never strings.
- Buckets above ``max_bucket`` (frequent shingles / degenerate bands) are
  dropped with a logged count instead of emitting O(m²) pairs.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from radiant_portal_pipeline_ray.functions.hashing import sha256_hex_array
from radiant_portal_pipeline_ray.sources.io import read_parquet_clean
from radiant_portal_pipeline_ray.stages.dedup import (
    JaccardVerifyStage,
    MinHashStage,
    ShingleExplodeStage,
    SimHashStage,
    candidate_pairs_from_buckets,
    make_band_exploder,
)

logger = logging.getLogger(__name__)

QUERIES: dict = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _docs(sf_dir: str, columns=None):
    return read_parquet_clean(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


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
def candidate_shingle_state(
    sh_ds: "rd.Dataset", cand_ids: set[int]
) -> dict[int, frozenset]:
    """Shingle-hash sets for CANDIDATE docs only: semi-filter the exploded
    (doc_id, s) dataset to the candidate ids, then fold into {id: set}.
    Memory is bounded by the candidate count, never the corpus size."""
    if not cand_ids:
        return {}
    ids_arr = pa.array(sorted(cand_ids), type=pa.int64())

    def semi(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("doc_id"), value_set=ids_arr))

    parts = ray.get(
        sh_ds.map_batches(semi, batch_format="pyarrow").to_arrow_refs()
    )
    t = pa.concat_tables([p for p in parts if p.num_rows])
    if t.num_rows == 0:
        return {}
    doc = t.column("doc_id").to_numpy()
    s = t.column("s").to_numpy()
    order = np.argsort(doc, kind="stable")
    doc, s = doc[order], s[order]
    bounds = np.flatnonzero(np.diff(doc)) + 1
    out: dict[int, frozenset] = {}
    for chunk_ids, chunk_s in zip(
        np.split(doc, bounds), np.split(s, bounds)
    ):
        out[int(chunk_ids[0])] = frozenset(chunk_s.tolist())
    return out


def _verify_pairs(
    sh_ds: "rd.Dataset",
    pairs_ds: "rd.Dataset",
    num: int = 1,
    den: int = 2,
    query: str = "dedup",
):
    """Dedup candidate pairs, log dropped hot buckets, exact-verify via
    semi-filtered shingle state in an actor pool."""

    def real_pairs(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b.column("doc_a"), -1)).select(
            ["doc_a", "doc_b"]
        )

    def drop_markers(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("doc_a"), -1)).select(
            ["dropped_bucket"]
        )

    pairs_ds = pairs_ds.materialize()
    drops = [
        r["dropped_bucket"]
        for r in pairs_ds.map_batches(
            drop_markers, batch_format="pyarrow"
        ).take_all()
    ]
    if drops:
        logger.warning(
            "%s: dropped %d over-cap candidate buckets (sizes %s...)",
            query,
            len(drops),
            sorted(drops, reverse=True)[:5],
        )
    uniq = (
        pairs_ds.map_batches(real_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
    # candidate set is tiny relative to the corpus — safe to pull
    pairs_t = pa.concat_tables(
        [p for p in ray.get(uniq.to_arrow_refs())]
    )
    cand_ids = set(pairs_t.column("doc_a").to_pylist()) | set(
        pairs_t.column("doc_b").to_pylist()
    )
    state_ref = ray.put(candidate_shingle_state(sh_ds, cand_ids))
    verified = rd.from_arrow(pairs_t).map_batches(
        JaccardVerifyStage,
        fn_constructor_args=(state_ref, num, den),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return verified.select_columns(["doc_a", "doc_b", "inter", "uni"]).sort(
        ["doc_a", "doc_b"]
    )


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
def dd_ngram_jaccard(sf_dir: str, max_bucket: int = 4096):
    """Exact 3-gram Jaccard ≥ 0.5 pairs. Candidates = docs sharing ≥1
    shingle (inverted-index groupby over int64 shingle hashes — exact,
    since J ≥ 0.5 ⇒ shared shingle; a hash collision only adds a candidate
    that verification rejects). Verification joins back to the semi-filtered
    candidate shingle sets — no whole-corpus state anywhere."""
    sh = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ShingleExplodeStage(k=3), batch_format="pyarrow")
        .materialize()
    )
    pairs = sh.groupby("s").map_groups(
        lambda g: candidate_pairs_from_buckets(g, "doc_id", max_bucket),
        batch_format="pyarrow",
    )
    return _verify_pairs(sh, pairs, num=1, den=2, query="dd_ngram_jaccard")


# ---------------------------------------------------------------------------
@_register("dd_minhash_lsh", None)  # approximate candidates — rows-only
def dd_minhash_lsh(sf_dir: str, max_bucket: int = 4096):
    """MinHash(64 perms) + LSH banding(16 bands × 4 rows) near-dup pairs,
    exact-verified at J ≥ 0.5. Scale path: vectorized signatures per batch,
    ONE groupby on (band, band_hash), candidate pairs per bucket, verify
    against semi-filtered candidate shingle sets."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    sh = docs.map_batches(
        ShingleExplodeStage(k=3), batch_format="pyarrow"
    ).materialize()
    sigs = docs.map_batches(MinHashStage(n_perm=64, shingle_k=3), batch_format="pyarrow")
    buckets = sigs.map_batches(
        make_band_exploder(n_bands=16, rows_per_band=4), batch_format="pyarrow"
    )
    pairs = buckets.groupby(["band", "band_hash"]).map_groups(
        lambda g: candidate_pairs_from_buckets(g, "doc_id", max_bucket),
        batch_format="pyarrow",
    )
    return _verify_pairs(sh, pairs, num=1, den=2, query="dd_minhash_lsh")


# ---------------------------------------------------------------------------
@_register("dd_simhash", None)  # signature-distance dedup — rows-only
def dd_simhash(sf_dir: str, max_bucket: int = 4096):
    """64-bit SimHash near-dup: candidates share one of four 16-bit chunks
    (pigeonhole: hamming ≤ 3 guarantees a shared chunk), verified at
    hamming ≤ 6. Chunk exploding, pair generation and hamming are all
    numpy-vectorized; over-cap chunk buckets are dropped and logged."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(SimHashStage(), batch_format="pyarrow")

    def explode_chunks(b: pa.Table) -> pa.Table:
        sim = b.column("simhash")
        if isinstance(sim, pa.ChunkedArray):
            sim = sim.combine_chunks()
        valid = pc.is_valid(sim).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)[valid]
        u = sim.to_numpy(zero_copy_only=False)[valid].astype(np.int64).view(
            np.uint64
        )
        n = len(ids)
        chunk_no = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        chunk_val = (
            (u[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), type=pa.int64()),
                "chunk_no": pa.array(chunk_no, type=pa.int32()),
                "chunk_val": pa.array(chunk_val.ravel(), type=pa.int32()),
                "simhash": pa.array(
                    np.repeat(u.view(np.int64), 4), type=pa.int64()
                ),
            }
        )

    buckets = sigs.map_batches(explode_chunks, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        t = g.group_by(["doc_id", "simhash"]).aggregate([])
        ids = t.column("doc_id").to_numpy()
        sims = t.column("simhash").to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, sims = ids[order], sims[order]
        m = len(ids)
        if m > max_bucket:
            return pa.table(
                {
                    "doc_a": pa.array([-1], type=pa.int64()),
                    "doc_b": pa.array([-1], type=pa.int64()),
                    "hamming": pa.array([m], type=pa.int64()),
                }
            )
        iu, ju = np.triu_indices(m, k=1)
        x = (sims[iu] ^ sims[ju]).view(np.uint64)
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
            axis=1
        )
        keep = ham <= 6
        return pa.table(
            {
                "doc_a": pa.array(ids[iu][keep], type=pa.int64()),
                "doc_b": pa.array(ids[ju][keep], type=pa.int64()),
                "hamming": pa.array(ham[keep].astype(np.int64), type=pa.int64()),
            }
        )

    pairs = buckets.groupby(["chunk_no", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    ).materialize()
    drops = [
        r["hamming"]
        for r in pairs.map_batches(
            lambda b: b.filter(pc.equal(b.column("doc_a"), -1)),
            batch_format="pyarrow",
        ).take_all()
    ]
    if drops:
        logger.warning(
            "dd_simhash: dropped %d over-cap chunk buckets (sizes %s...)",
            len(drops),
            sorted(drops, reverse=True)[:5],
        )
    return (
        pairs.map_batches(
            lambda b: b.filter(pc.not_equal(b.column("doc_a"), -1)),
            batch_format="pyarrow",
        )
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["doc_a", "doc_b"])
    )

"""HLL distinct sketch: rank extraction vs a reference implementation,
merge associativity (batch-split independence), error gates at table scale
and at 1M cardinality, plus the split-assignment invariance property."""

import numpy as np
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.pipelines.sketches import (
    HllSketch,
    _splitmix64,
    q_approx_distinct_users,
)

SF = "/root/testdata/sf0.01"


def _ref_rank(h: int, p: int) -> int:
    """Reference: leading zeros of the low 64-p bits (shifted high) + 1."""
    rest = (h << p) & ((1 << 64) - 1)
    if rest == 0:
        return (64 - p) + 1
    return min(64 - rest.bit_length(), 64 - p) + 1


def test_rank_extraction_matches_reference():
    p = 14
    hll = HllSketch(p)
    rng = np.random.default_rng(0)
    vals = rng.integers(-(2**62), 2**62, size=4096, dtype=np.int64)
    # recompute ranks through the public path: registers of singletons
    hs = _splitmix64(vals.astype(np.uint64))
    for v, h in zip(vals[:256], hs[:256]):
        regs = hll.registers(np.array([v], dtype=np.int64))
        idx = int(h >> np.uint64(64 - p))
        assert int(regs[idx]) == _ref_rank(int(h), p)
        assert int(np.count_nonzero(regs)) == 1


def test_merge_is_batch_split_independent():
    hll = HllSketch(12)
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**40, size=50_000, dtype=np.int64)
    whole = hll.registers(vals)
    merged = np.zeros_like(whole)
    for chunk in np.array_split(vals, 7):
        np.maximum(merged, hll.registers(chunk), out=merged)
    assert np.array_equal(whole, merged)


def test_estimate_error_at_1m_cardinality():
    hll = HllSketch(14)
    vals = np.arange(1_000_000, dtype=np.int64)  # 1M distinct
    est = hll.estimate(hll.registers(vals))
    err = abs(est - 1_000_000) / 1_000_000
    assert err < 0.025, f"HLL p=14 error {err:.4f} exceeds 2.5%"


def test_query_matches_exact_within_gate(ray_session):
    got = q_approx_distinct_users(SF).to_pandas()
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    df = t.to_pandas()
    exact = df.groupby("event_type")["user_id"].nunique()
    assert set(got["event_type"]) == set(exact.index)
    for _, row in got.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["approx_users"] - e) / max(e, 1) < 0.02, (
            row["event_type"],
            row["approx_users"],
            e,
        )


def test_split_assignment_is_stable_under_corpus_growth(ray_session):
    """A doc's split never changes when other docs are added: assignment on
    the sf0.001 subset agrees with assignment on the sf0.01 corpus."""
    from radiant_portal_pipeline_ray.pipelines.sketches import t_split_assign

    small = t_split_assign("/root/testdata/sf0.001").to_pandas()
    big = t_split_assign(SF).to_pandas()
    m = dict(zip(big["doc_id"], big["split"]))
    overlap = [d for d in small["doc_id"] if d in m]
    if overlap:
        s = dict(zip(small["doc_id"], small["split"]))
        assert all(s[d] == m[d] for d in overlap)
    # bands are roughly 90/5/5
    frac = (big["split"] == "train").mean()
    assert 0.8 < frac < 0.97

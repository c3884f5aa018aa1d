"""Bloom filter stage: no false negatives, sane FP rate, and the
pre-filter actually shrinks the exact join's probe side."""

import numpy as np
import pyarrow as pa

from radiant_portal_pipeline_ray.stages.bloom import BloomFilter, build_bloom

SF_DIR = "/root/testdata/sf0.001"


def test_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64)
    bf = BloomFilter(log2_m=20, k=7)  # ~21 bits/key → fp ≪ 1%
    words = bf.partial(members)
    assert bf.might_contain(words, members).all()  # no false negatives, ever
    non = np.setdiff1d(
        rng.choice(10_000_000, size=120_000, replace=False).astype(np.int64),
        members,
    )
    fp = float(bf.might_contain(words, non).mean())
    assert fp < 0.01, fp


def test_distributed_build_matches_local(ray_session):
    import ray
    import ray.data as rd

    vals = np.arange(100_000, dtype=np.int64) * 37
    ds = rd.from_arrow(pa.table({"key": pa.array(vals)})).repartition(8)
    bf, ref = build_bloom(ds, "key", log2_m=20, k=7)
    words = ray.get(ref)
    assert (words == bf.partial(vals)).all()  # OR-fold associativity


def test_bloom_probe_shrinks_exact_join(ray_session):
    """The bloom pass must reject (almost) every non-matching probe row —
    the whole point of the stage is shuffle-volume reduction."""
    import ray
    import ray.data as rd

    rng = np.random.default_rng(3)
    keys = rng.choice(1_000_000, size=2_000, replace=False).astype(np.int64)
    probe_vals = rng.choice(1_000_000, size=100_000).astype(np.int64)
    keys_ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4)
    bf, ref = build_bloom(keys_ds, "k", log2_m=20, k=7)
    words = ray.get(ref)
    kept = bf.might_contain(words, probe_vals)
    true_mask = np.isin(probe_vals, keys)
    assert kept[true_mask].all()  # every true match survives
    # false-positive tail stays below 1% of the non-matching rows
    assert kept[~true_mask].mean() < 0.01

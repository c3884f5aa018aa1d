"""Distributed near-dup verification: the scale path (forced via
``_DRIVER_PAIR_THRESHOLD = 0``) must produce byte-identical results to the
driver fast path, with ZERO driver-assembled shingle state; and dropped
over-cap buckets must cost candidate recall only — surviving pairs keep
exact ``inter``/``uni`` values (round-2 advice)."""

import os

import pandas as pd
import pytest

import radiant_portal_pipeline_ray.pipelines.dedup as dd

SF = "/root/testdata/sf0.001"


def _pdf(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_ngram_distributed_verify_matches_driver(monkeypatch):
    expected = _pdf(dd.dd_ngram_jaccard(SF))
    assert len(expected) > 0
    monkeypatch.setattr(dd, "_DRIVER_PAIR_THRESHOLD", 0)
    got = _pdf(dd.dd_ngram_jaccard(SF))
    pd.testing.assert_frame_equal(got, expected)


@pytest.mark.usefixtures("ray_session")
def test_minhash_distributed_verify_matches_driver(monkeypatch):
    expected = _pdf(dd.dd_minhash_lsh(SF))
    assert len(expected) > 0
    monkeypatch.setattr(dd, "_DRIVER_PAIR_THRESHOLD", 0)
    got = _pdf(dd.dd_minhash_lsh(SF))
    pd.testing.assert_frame_equal(got, expected)


@pytest.mark.usefixtures("ray_session")
def test_dropped_buckets_keep_survivor_values_exact():
    """With an aggressively small bucket cap, many shingle buckets drop.
    Survivors must be a SUBSET of the uncapped result with IDENTICAL
    inter/uni values (no undercounting from missing bucket multiplicity)."""
    full = _pdf(dd.dd_ngram_jaccard(SF))
    capped = _pdf(dd.dd_ngram_jaccard(SF, max_bucket=2))
    merged = capped.merge(
        full, on=["doc_a", "doc_b"], how="left", suffixes=("", "_full")
    )
    # every surviving pair exists in the full result...
    assert not merged["inter_full"].isna().any()
    # ...with exactly the same values
    assert (merged["inter"] == merged["inter_full"]).all()
    assert (merged["uni"] == merged["uni_full"]).all()


@pytest.mark.usefixtures("ray_session")
def test_distributed_path_builds_no_driver_state(monkeypatch):
    """The scale path must never call the driver-state builder."""
    monkeypatch.setattr(dd, "_DRIVER_PAIR_THRESHOLD", 0)

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("driver shingle state built on the scale path")

    monkeypatch.setattr(dd, "candidate_shingle_table", boom)
    got = _pdf(dd.dd_ngram_jaccard(SF))
    assert len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_connected_components_distributed_matches_union_find(monkeypatch):
    expected = _pdf(dd.dd_dedup_corpus(SF))
    assert len(expected) > 0
    monkeypatch.setattr(dd, "_CC_DRIVER_EDGE_THRESHOLD", 0)
    got = _pdf(dd.dd_dedup_corpus(SF))
    pd.testing.assert_frame_equal(got, expected)

"""Two-pass histogram-refine quantiles: parity with the co-locating exact
path and the near-constant single-bin-skew edge case."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.pipelines.textops import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_scalable_matches_colocated(ray_session):
    exact = QUERIES["q_quality_quantiles"][0](SF_DIR).to_pandas()
    scalable = QUERIES["q_quality_quantiles_scalable"][0](SF_DIR).to_pandas()
    assert exact.reset_index(drop=True).equals(scalable.reset_index(drop=True))


def test_single_bin_skew(ray_session, tmp_path):
    """A near-constant length column puts all mass in one log bin; the
    gathered bin IS the whole group and the picks are still exact."""
    docs = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "lang": pa.array(["xx"] * 100, pa.string()),
            # lengths 300/301 land in the same floor(64*log2(v+1)) bin
            "text": pa.array(
                ["a" * (300 + (i % 2)) for i in range(100)], pa.string()
            ),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))
    out = QUERIES["q_quality_quantiles_scalable"][0](str(tmp_path)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # ranks: ceil(.25*100)=25 -> 300, ceil(.5*100)=50 -> 300, ceil(.9*100)=90 -> 301
    assert (
        row["p25_chars"],
        row["p50_chars"],
        row["p90_chars"],
        row["n_docs"],
    ) == (300, 300, 301, 100)

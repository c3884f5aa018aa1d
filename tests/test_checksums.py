"""Anti-entropy property of cdc_bucket_checksums: any single-row
difference between two replicas flips that bucket's checksum, and
identical replicas agree bucket-for-bucket."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.pipelines.sketches import cdc_bucket_checksums

SF = "/root/testdata/sf0.001"


def _run(sf_dir):
    t = cdc_bucket_checksums(sf_dir)
    df = t.to_pandas() if not hasattr(t, "to_pandas") else t.to_pandas()
    return df.set_index("bucket").sort_index()


def test_identical_replicas_agree(tmp_path, ray_session):
    a = _run(SF)
    # byte-identical copy = replica
    rep = tmp_path / "replica"
    rep.mkdir()
    src = pq.read_table(f"{SF}/events.parquet")
    pq.write_table(src, rep / "events.parquet")
    b = _run(str(rep))
    assert a.equals(b)


def test_single_row_mutation_flips_exactly_one_bucket(tmp_path, ray_session):
    src = pq.read_table(f"{SF}/events.parquet")
    et = src.column("event_type").to_pylist()
    uid = src.column("user_id").to_pylist()
    # mutate one row's event_type
    victim = 7
    et[victim] = et[victim] + "_x"
    mut = src.set_column(
        src.schema.get_field_index("event_type"),
        pa.field("event_type", pa.string()),
        pa.array(et, pa.string()),
    )
    rep = tmp_path / "mutated"
    rep.mkdir()
    pq.write_table(mut, rep / "events.parquet")
    a, b = _run(SF), _run(str(rep))
    diff = (a["checksum_lo"] != b["checksum_lo"]) | (
        a["checksum_hi"] != b["checksum_hi"]
    )
    assert diff.sum() == 1
    assert diff.idxmax() == uid[victim] % 16
    # counts unchanged — checksum catches what counts cannot
    assert (a["n_rows"] == b["n_rows"]).all()

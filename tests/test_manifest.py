import json
import os

import pyarrow as pa
import pytest

from radiant_portal_pipeline_ray.schemas import CHANGELOG_SCHEMA
from radiant_portal_pipeline_ray.state.manifest import (
    CommitConflict,
    Lake,
    Manifest,
    PartitionState,
)


def _manifest(lake, version, txn, parent=None):
    return Manifest(
        version=version,
        txn_id=txn,
        parent_version=parent,
        schema=CHANGELOG_SCHEMA,
        partitions={0: PartitionState(files=[], rows=0, bytes=0, watermark_lsn=5)},
    )


def test_commit_roundtrip(tmp_lake):
    lake = Lake(tmp_lake)
    assert lake.current_manifest() is None
    lake.commit(_manifest(lake, 1, "aaa"))
    cur = lake.current_manifest()
    assert cur.version == 1 and cur.txn_id == "aaa"
    assert cur.schema.equals(CHANGELOG_SCHEMA)
    assert cur.partitions[0].watermark_lsn == 5


def test_put_if_absent_and_idempotence(tmp_lake):
    lake = Lake(tmp_lake)
    lake.commit(_manifest(lake, 1, "aaa"))
    # same txn retried → idempotent success
    got = lake.commit(_manifest(lake, 1, "aaa"))
    assert got.txn_id == "aaa"
    # different txn, same version → conflict
    with pytest.raises(CommitConflict):
        lake.commit(_manifest(lake, 1, "bbb"))
    # conflicting txn retries at the next version → success
    lake.commit(_manifest(lake, 2, "bbb", parent=1))
    assert lake.current_version() == 2


def test_promote_staged_files(tmp_lake):
    lake = Lake(tmp_lake)
    sd = lake.staging_dir("t1")
    os.makedirs(os.path.join(sd, "part=3"), exist_ok=True)
    with open(os.path.join(sd, "part=3", "t1-3-0000.parquet"), "wb") as f:
        f.write(b"x")
    out = lake.promote_staged_files("t1")
    assert out == {3: ["data/part=3/t1-3-0000.parquet"]}
    assert os.path.exists(lake.abspath(out[3][0]))
    # idempotent if re-run after partial crash
    os.makedirs(os.path.join(lake.staging_dir("t1"), "part=3"), exist_ok=True)
    with open(os.path.join(sd, "part=3", "t1-3-0000.parquet"), "wb") as f:
        f.write(b"x")
    out2 = lake.promote_staged_files("t1")
    assert out2 == out


def test_gc_orphans(tmp_lake):
    lake = Lake(tmp_lake)
    man = _manifest(lake, 1, "aaa")
    man.partitions[0].files = ["data/part=0/keep.parquet"]
    os.makedirs(os.path.join(lake.data_dir, "part=0"), exist_ok=True)
    for fn in ("keep.parquet", "orphan.parquet"):
        with open(os.path.join(lake.data_dir, "part=0", fn), "wb") as f:
            f.write(b"x")
    lake.commit(man)
    # default quiescence: a freshly written orphan may belong to an in-flight
    # promote→commit window and must survive the default-age GC
    assert "data/part=0/orphan.parquet" not in lake.gc_orphans()
    assert os.path.exists(lake.abspath("data/part=0/orphan.parquet"))
    removed = lake.gc_orphans(staging_age_s=0.0)
    assert "data/part=0/orphan.parquet" in removed
    assert os.path.exists(lake.abspath("data/part=0/keep.parquet"))

"""Object-store lake backend (fsspec): the exactly-once commit protocol on
non-POSIX primitives — copy-promote, put-if-absent manifest publish, GC —
plus the full apply → compact → gc → time-travel cycle through Ray on an
fsspec ``file://`` root (cross-process, object-store code paths only).

VERDICT r3 'Next round' #1: POSIX hard-link CAS was the only commit
primitive; a multi-node lake lives on S3-style storage."""

import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from radiant_portal_pipeline_ray.state.manifest import (
    CommitConflict,
    Lake,
    Manifest,
    PartitionState,
)


def _mem_lake(name: str) -> Lake:
    import fsspec

    fs = fsspec.filesystem("memory")
    root = f"/graft-test-{name}"
    if fs.exists(root):
        fs.rm(root, recursive=True)
    return Lake(f"memory://{root.lstrip('/')}")


def _stage_one(lake: Lake, txn: str, part: int, n: int = 5) -> None:
    sd = lake.staging_dir(txn)
    pdir = f"{sd}/part={part}"
    lake.filesystem.makedirs(pdir, exist_ok=True)
    t = pa.table({"url": [f"u{i}" for i in range(n)], "deleted": [False] * n})
    pq.write_table(t, f"{pdir}/{txn}-{part}-0000.parquet", filesystem=lake.filesystem)


def _manifest(version, txn, parts, parent=None):
    return Manifest(
        version=version,
        txn_id=txn,
        parent_version=parent,
        schema=pa.schema([("url", pa.string()), ("deleted", pa.bool_())]),
        n_parts=2,
        partitions=parts,
    )


def test_memory_lake_promote_commit_idempotent_and_conflict():
    lake = _mem_lake("commit")
    assert lake.filesystem is not None
    txn = lake.new_txn_id()
    _stage_one(lake, txn, 0)
    promoted = lake.promote_staged_files(txn)
    assert promoted[0] == [f"data/part=0/{txn}-0-0000.parquet"]
    # promote is idempotent (re-run after a crash between promote and commit)
    _stage_one(lake, txn, 0)
    assert lake.promote_staged_files(txn)[0] == promoted[0]

    parts = {0: PartitionState(files=promoted[0], rows=5, watermark_lsn=10)}
    m = _manifest(1, txn, parts)
    committed = lake.commit(m)
    assert committed.version == 1
    # idempotent re-commit of the same txn
    assert lake.commit(_manifest(1, txn, parts)).txn_id == txn
    # a different txn publishing the same version loses the CAS
    with pytest.raises(CommitConflict):
        lake.commit(_manifest(1, "othertxn12345678", parts))
    # content survives the round-trip (committed_at is stamped at commit)
    back = lake.read_manifest(1)
    assert back.txn_id == txn and back.partitions[0].files == promoted[0]
    assert back.partitions[0].watermark_lsn == 10
    # and the data file is readable through the lake fs
    t = pq.read_table(lake.abspath(promoted[0][0]), filesystem=lake.filesystem)
    assert t.num_rows == 5


def test_memory_lake_gc_orphans_and_time_travel():
    lake = _mem_lake("gc")
    files_by_v = {}
    prev = None
    for v in (1, 2, 3):
        txn = lake.new_txn_id()
        _stage_one(lake, txn, 0, n=v)
        promoted = lake.promote_staged_files(txn)
        parts = {0: PartitionState(files=promoted[0], rows=v, watermark_lsn=v)}
        prev = lake.commit(_manifest(v, txn, parts, parent=prev and prev.version))
        files_by_v[v] = promoted[0][0]
    # orphan: a staged dir from an abandoned txn, quiescent
    dead = lake.new_txn_id()
    _stage_one(lake, dead, 1)

    removed = lake.gc_orphans(keep_versions=2, staging_age_s=0.0)
    assert lake.versions() == [2, 3]
    # v1's data file is unreferenced → deleted; v2/v3's retained
    assert files_by_v[1] in removed
    assert not lake.filesystem.exists(lake.abspath(files_by_v[1]))
    assert lake.filesystem.exists(lake.abspath(files_by_v[2]))
    # abandoned staging reclaimed
    assert any(r.startswith(f"_staging/{dead}/") for r in removed)
    # time travel to a retained version still reads
    m2 = lake.read_manifest(2)
    t = pq.read_table(lake.abspath(m2.partitions[0].files[0]), filesystem=lake.filesystem)
    assert t.num_rows == 2


def test_memory_lake_gc_quiescence_guard():
    """Freshly promoted-but-unreferenced files (promote→commit window) must
    survive GC until quiescent."""
    lake = _mem_lake("quiesce")
    txn = lake.new_txn_id()
    _stage_one(lake, txn, 0)
    promoted = lake.promote_staged_files(txn)
    # no manifest references it yet; a GC with a 1h age must keep it
    lake.gc_orphans(keep_versions=2, staging_age_s=3600.0)
    assert lake.filesystem.exists(lake.abspath(promoted[0][0]))


def test_fsspec_file_lake_full_cycle(ray_session, tmp_path):
    """apply → reapply (carry/tombstones) → compact → gc → time-travel on an
    fsspec ``file://`` root: every lake read/write goes through the
    object-store code paths (copy-promote, put-verify, fs-threaded parquet
    IO in split/merge/compact tasks) while staying cross-process real."""
    from radiant_portal_pipeline_ray.config import EngineConfig
    from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
    from radiant_portal_pipeline_ray.pipelines.maintenance import compact
    from radiant_portal_pipeline_ray.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=800, n_events=4000, n_batches=3, seed=31),
    )

    def sorted_state(eng):
        t = eng.snapshot_table()
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    # POSIX reference lake
    posix = CdcEngine(str(tmp_path / "posix"), EngineConfig(n_parts=4))
    for p in paths:
        posix.apply([p])

    fs_root = f"file://{tmp_path}/objstore"
    eng = CdcEngine(fs_root, EngineConfig(n_parts=4))
    assert eng.lake.filesystem is not None, "file:// must take the fsspec path"
    for p in paths:
        rep = eng.apply([p])
    assert rep["version"] == 3
    assert sorted_state(eng).equals(sorted_state(posix))

    # re-apply is a watermark no-op on the object-store backend too
    rep = eng.apply([paths[-1]])
    assert rep.get("noop") or rep["rows_upserted"] == 0

    # compact through the fs-threaded rewrite
    before = sorted_state(eng)
    crep = compact(fs_root, EngineConfig(n_parts=4), min_files=1)
    assert not crep["noop"]
    assert sorted_state(eng).equals(before)

    # gc prunes old versions; time travel to a retained one still works
    v_now = eng.lake.current_version()
    eng.lake.gc_orphans(keep_versions=2, staging_age_s=0.0)
    assert eng.lake.versions()[-1] == v_now
    prev_v = eng.lake.versions()[0]
    tt = eng.snapshot_table(version=prev_v)
    assert tt.num_rows > 0
    # streaming read path with the wrapped pyarrow fs
    assert eng.read_snapshot().count() == before.num_rows


def test_fsspec_lake_salting_migration(ray_session, tmp_path):
    """Hot-domain salting + deferred migration on the object-store backend:
    migrating partitions' carried rows are re-read through the lake fs
    inside split tasks (enumerate_units/split_task filesystem threading)."""
    from radiant_portal_pipeline_ray.config import EngineConfig
    from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
    from radiant_portal_pipeline_ray.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    spec = ChangelogSpec(
        n_urls=1200, n_events=4000, n_batches=3, seed=13, zipf_a=2.5
    )
    paths = generate_changelog(str(tmp_path / "cl"), spec)
    kw = dict(n_parts=4, salt_threshold_rows=400, salt_target_rows=250)

    def replay(root):
        eng = CdcEngine(root, EngineConfig(**kw))
        for p in paths:
            eng.apply([p])
        return eng

    posix = replay(str(tmp_path / "posix"))
    obj = replay(f"file://{tmp_path}/objstore")
    assert obj.lake.current_manifest().salt_map, "salting never fired"

    def state(eng):
        t = eng.snapshot_table()
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    assert state(obj).equals(state(posix))


def test_fsspec_concurrent_commit_conflict(tmp_path):
    """Two writers racing the same version on the object-store backend: one
    wins the put-if-absent, the other gets CommitConflict."""
    root = f"file://{tmp_path}/racelake"
    a, b = Lake(root), Lake(root)
    txa, txb = a.new_txn_id(), b.new_txn_id()
    pa_state = {0: PartitionState(files=[], rows=0, watermark_lsn=1)}
    a.commit(_manifest(1, txa, pa_state))
    with pytest.raises(CommitConflict):
        b.commit(_manifest(1, txb, pa_state))
    # loser retries against the new current and lands v2
    cur = b.current_manifest()
    assert cur.version == 1 and cur.txn_id == txa
    b.commit(_manifest(2, txb, pa_state, parent=1))
    assert b.current_version() == 2


def test_fsspec_staging_cleanup_eventual(tmp_path):
    """Commit cleans the txn staging dir (async); gc reclaims stragglers."""
    lake = Lake(f"file://{tmp_path}/cleanlake")
    txn = lake.new_txn_id()
    sd = lake.staging_dir(txn)
    lake.filesystem.makedirs(f"{sd}/part=0", exist_ok=True)
    pq.write_table(
        pa.table({"url": ["x"], "deleted": [False]}),
        f"{sd}/part=0/{txn}-0-0000.parquet",
        filesystem=lake.filesystem,
    )
    promoted = lake.promote_staged_files(txn)
    lake.commit(_manifest(1, txn, {0: PartitionState(files=promoted[0])}))
    deadline = time.time() + 5
    while time.time() < deadline and lake.filesystem.exists(sd):
        time.sleep(0.05)
    if lake.filesystem.exists(sd):  # async thread lost the race — gc owns it
        lake.gc_orphans(keep_versions=2, staging_age_s=0.0)
    assert not lake.filesystem.exists(sd)


def test_memory_lake_tags_pin_through_gc():
    lake = _mem_lake("tags")
    for v, txn in ((1, "ta"), (2, "tb"), (3, "tc")):
        _stage_one(lake, txn, 0)
        files = lake.promote_staged_files(txn)
        lake.commit(
            _manifest(
                v,
                txn,
                {0: PartitionState(files=files[0], watermark_lsn=v)},
                parent=v - 1 if v > 1 else None,
            )
        )
    lake.set_tag("keep", 1)
    assert lake.tags() == {"keep": 1}
    lake.gc_orphans(keep_versions=1, staging_age_s=0.0)
    assert 1 in lake.versions() and 2 not in lake.versions()
    assert lake.read_manifest(lake.resolve_tag("keep")).version == 1
    lake.delete_tag("keep")
    lake.gc_orphans(keep_versions=1, staging_age_s=0.0)
    assert lake.versions() == [3]


def test_memory_lake_clone():
    lake = _mem_lake("clone-src")
    _stage_one(lake, "tsrc", 0)
    files = lake.promote_staged_files("tsrc")
    lake.commit(
        _manifest(1, "tsrc", {0: PartitionState(files=files[0], watermark_lsn=1)})
    )
    import fsspec

    fs = fsspec.filesystem("memory")
    if fs.exists("/graft-test-clone-dst"):
        fs.rm("/graft-test-clone-dst", recursive=True)
    dst = lake.clone_to("memory://graft-test-clone-dst")
    man = dst.current_manifest()
    assert man.version == 1 and man.partitions[0].files == files[0]
    for f in files[0]:
        assert dst._exists(dst.abspath(f))

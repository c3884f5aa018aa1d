"""Instant writable fork: clone_to hard-links the data files (POSIX), the
two lakes evolve independently, and GC in one never breaks the other
(hard links share the inode; each lake unlinks only its own name)."""

import pytest

from radiant_portal_pipeline_ray import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def test_clone_forks_independently(tmp_path, ray_session):
    cl = str(tmp_path / "cl")
    paths = generate_changelog(
        cl, ChangelogSpec(n_urls=300, n_events=1500, n_batches=3, seed=51)
    )
    src = CdcEngine(str(tmp_path / "prod"), EngineConfig(n_parts=4))
    src.apply(paths[:2])
    v = src.lake.current_manifest().version
    base = src.snapshot_checksums()

    fork_lake = src.lake.clone_to(str(tmp_path / "fork"))
    fork = CdcEngine(str(tmp_path / "fork"), EngineConfig(n_parts=4))
    # identical content at the fork point, same version number
    assert fork.lake.current_manifest().version == v
    assert fork.snapshot_checksums().equals(base)

    # diverge: prod gets batch 3; the fork reprocesses batch 2 differently
    src.apply(paths[2:])
    r = fork.apply(paths[2:])
    assert r["version"] == v + 1
    # both advanced; contents now equal (same events) but INDEPENDENT lakes
    assert src.snapshot_checksums().equals(fork.snapshot_checksums())

    # GC the fork hard; prod must stay fully readable (shared inodes)
    fork.lake.gc_orphans(keep_versions=1, staging_age_s=0.0)
    assert src.snapshot_table().num_rows > 0
    assert src.snapshot_checksums().num_rows > 0
    # and vice versa
    src.lake.gc_orphans(keep_versions=1, staging_age_s=0.0)
    assert fork.snapshot_table().num_rows > 0


def test_clone_refuses_nonempty_target(tmp_path, ray_session):
    cl = str(tmp_path / "cl")
    paths = generate_changelog(
        cl, ChangelogSpec(n_urls=50, n_events=200, n_batches=1, seed=52)
    )
    src = CdcEngine(str(tmp_path / "prod"), EngineConfig(n_parts=2))
    src.apply(paths)
    src.lake.clone_to(str(tmp_path / "fork"))
    with pytest.raises(FileExistsError):
        src.lake.clone_to(str(tmp_path / "fork"))

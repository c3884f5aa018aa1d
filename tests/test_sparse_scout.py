"""The sparse_scout probe (column-pruned changed-parts detection) must
produce exactly the same committed state as the default materialized probe."""

from __future__ import annotations

import pyarrow.compute as pc

from radiant_portal_pipeline_ray import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def _replay(lake_root: str, paths, sparse: bool):
    eng = CdcEngine(
        lake_root, EngineConfig(n_parts=4, sparse_scout=sparse)
    )
    eng.apply(paths[:2])
    eng.apply(paths[2:])
    t = eng.snapshot_table()
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def test_sparse_scout_state_equals_default(ray_session, tmp_path):
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=400, n_events=2500, n_batches=4, seed=13),
    )
    a = _replay(str(tmp_path / "lake_default"), paths, sparse=False)
    b = _replay(str(tmp_path / "lake_sparse"), paths, sparse=True)
    assert a.schema.equals(b.schema)
    assert a.equals(b)


def test_sparse_scout_noop_and_resume(ray_session, tmp_path):
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=200, n_events=1200, n_batches=3, seed=5),
    )
    eng = CdcEngine(
        str(tmp_path / "lake"), EngineConfig(n_parts=4, sparse_scout=True)
    )
    eng.apply(paths)
    r = eng.apply(paths)  # full re-delivery: everything pre-watermark
    assert r["noop"] is True and r["version"] == 1

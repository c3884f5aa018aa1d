"""Compaction vs concurrent-writer conflict handling: safe rebase when the
competing commit touched OTHER partitions; clean abort when it touched a
partition being compacted."""

import pyarrow.compute as pc
import pytest

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.pipelines.maintenance import (
    CompactionConflict,
    compact,
)
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)
from radiant_portal_pipeline_ray.state.manifest import Lake, Manifest


def _setup(tmp_path, n_batches=4):
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=400, n_events=2500, n_batches=n_batches, seed=5),
    )
    lake_root = str(tmp_path / "lake")
    eng = CdcEngine(lake_root, EngineConfig(n_parts=4, target_rows_per_file=50))
    for p in paths:
        eng.apply([p])
    return lake_root, eng


def _inject_competing_commit(lake_root, touch_parts, monkeypatch):
    """Patch Lake.commit so the FIRST compaction commit races a competing
    manifest version that modifies ``touch_parts`` (or none)."""
    orig = Lake.commit
    state = {"injected": False}

    def racing_commit(self, manifest):
        if not state["injected"]:
            state["injected"] = True
            base = self.current_manifest()
            parts = dict(base.partitions)
            for p in touch_parts:
                st = parts[p]
                # simulate another writer REWRITING the partition's data
                st.files = list(st.files[:1])
                st.watermark_lsn += 1
            competing = Manifest(
                version=base.version + 1,
                txn_id="cafecafecafecafe",
                parent_version=base.version,
                schema=base.schema,
                n_parts=base.n_parts,
                partitions=parts,
                salt_map=base.salt_map,
                next_part=base.next_part,
            )
            orig(self, competing)
        return orig(self, manifest)

    monkeypatch.setattr(Lake, "commit", racing_commit)


def test_compact_rebases_when_competitor_touches_other_partitions(
    ray_session, tmp_path, monkeypatch
):
    lake_root, eng = _setup(tmp_path)
    # competing commit changes no compacted partition's files → compact
    # rebases onto the new version and succeeds
    _inject_competing_commit(lake_root, touch_parts=[], monkeypatch=monkeypatch)
    before = eng.snapshot_table()
    r = compact(lake_root, EngineConfig(n_parts=4), min_files=2)
    assert r["noop"] is False
    assert r["commit_attempts"] >= 2  # first attempt hit the conflict
    after = eng.snapshot_table()
    a = before.take(pc.sort_indices(before, sort_keys=[("url", "ascending")]))
    b = after.take(pc.sort_indices(after, sort_keys=[("url", "ascending")]))
    assert a.equals(b)


def test_compact_aborts_when_competitor_touches_compacted_partition(
    ray_session, tmp_path, monkeypatch
):
    lake_root, eng = _setup(tmp_path)
    man = eng.lake.current_manifest()
    victim = next(p for p, st in man.partitions.items() if len(st.files) >= 2)
    _inject_competing_commit(
        lake_root, touch_parts=[victim], monkeypatch=monkeypatch
    )
    with pytest.raises(CompactionConflict):
        compact(lake_root, EngineConfig(n_parts=4), min_files=2)
    # the competing commit is the current version; lake still consistent
    assert eng.lake.current_manifest().txn_id == "cafecafecafecafe"
    assert eng.snapshot_table().num_rows > 0

"""Byte-level determinism: two independent replays of the same changelog
produce IDENTICAL staged file bytes — the property that makes retried merge
tasks and re-run rounds exactly-once under the two-phase commit."""

import hashlib
import os

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def _content_hashes(eng) -> dict[str, str]:
    """{partition-relative file position: sha256} — txn ids differ between
    runs, so key by (part, index-within-part) instead of filename."""
    man = eng.lake.current_manifest()
    out = {}
    for p, st in sorted(man.partitions.items()):
        for i, f in enumerate(sorted(st.files)):
            h = hashlib.sha256()
            with open(eng.lake.abspath(f), "rb") as fh:
                h.update(fh.read())
            out[f"part={p}/{i}"] = h.hexdigest()
    return out


def test_replay_is_byte_deterministic(ray_session, tmp_path):
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=500, n_events=3000, n_batches=3, seed=31),
    )
    runs = []
    for run in ("a", "b"):
        eng = CdcEngine(
            str(tmp_path / f"lake_{run}"), EngineConfig(n_parts=4)
        )
        for p in paths:
            eng.apply([p])
        runs.append(_content_hashes(eng))
    assert runs[0].keys() == runs[1].keys()
    diff = [k for k in runs[0] if runs[0][k] != runs[1][k]]
    assert not diff, f"non-deterministic partitions: {diff}"

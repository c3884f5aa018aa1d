"""The task-shuffle exchange (stages/taskshuffle.py) must produce the exact
same committed state as the sort-shuffle exchange — including under schema
evolution, hot-domain salting/migration, and incremental resume."""

import pyarrow.compute as pc

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def _state(eng):
    t = eng.snapshot_table()
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def _replay(lake, paths, **cfg_kw):
    eng = CdcEngine(lake, EngineConfig(**cfg_kw))
    for p in paths:
        eng.apply([p])
    return eng


def test_task_exchange_matches_sort_exchange(ray_session, tmp_path):
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=800, n_events=4000, n_batches=3, seed=77),
    )
    sort_eng = _replay(str(tmp_path / "sort"), paths, n_parts=4, exchange="sort")
    task_eng = _replay(str(tmp_path / "task"), paths, n_parts=4, exchange="task")
    a, b = _state(sort_eng), _state(task_eng)
    assert a.equals(b), "task exchange diverged from sort exchange"
    # manifests agree on watermarks and doc-id counters too
    ms = sort_eng.lake.current_manifest()
    mt = task_eng.lake.current_manifest()
    for p, st in ms.partitions.items():
        assert mt.partitions[p].watermark_lsn == st.watermark_lsn
        assert mt.partitions[p].next_doc_seq == st.next_doc_seq


def test_task_exchange_with_salting_and_evolution(ray_session, tmp_path):
    spec = ChangelogSpec(
        n_urls=1500,
        n_events=5000,
        n_batches=3,
        seed=13,
        zipf_a=2.5,
        evolution=True,
    )
    paths = generate_changelog(str(tmp_path / "cl"), spec)
    kw = dict(n_parts=4, salt_threshold_rows=400, salt_target_rows=250)
    sort_eng = _replay(str(tmp_path / "sort"), paths, exchange="sort", **kw)
    task_eng = _replay(str(tmp_path / "task"), paths, exchange="task", **kw)
    assert task_eng.lake.current_manifest().salt_map, "salting never fired"
    assert _state(sort_eng).equals(_state(task_eng))


def test_task_exchange_idempotent_redelivery(ray_session, tmp_path):
    """Re-applying an already-committed batch is a watermark no-op."""
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=300, n_events=1200, n_batches=2, seed=5),
    )
    eng = _replay(str(tmp_path / "lake"), paths, n_parts=4, exchange="task")
    before = _state(eng)
    v_before = eng.lake.current_manifest().version
    rep = eng.apply([paths[-1]])  # duplicate re-delivery of the last batch
    assert rep.get("noop") or rep["rows_upserted"] == 0
    assert _state(eng).equals(before)
    assert eng.lake.current_manifest().version in (v_before, v_before + 1)

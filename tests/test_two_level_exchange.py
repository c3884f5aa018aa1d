"""Two-level task exchange (split → per-group subsplit → final buckets):
parity with the single-level exchange, driver-ref budget enforcement, and
the ADVICE r3 empty-input / schema-None guards."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from radiant_portal_pipeline_ray.stages import taskshuffle as ts


def _table(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 500, n), type=pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
        }
    )


def _grouped_sum(ds, n_buckets):
    def fn(t: pa.Table) -> pa.Table:
        return t.group_by("k").aggregate([("v", "sum")])

    out = ts.exchange_group(ds, ["k"], n_buckets, fn)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("k", "ascending")]))


def test_exchange_group_two_level_parity(ray_session, monkeypatch):
    t = _table()
    ds = rd.from_arrow(t).repartition(8)
    monkeypatch.setattr(ts, "_DRIVER_LOCAL_BYTES", 0)
    single = _grouped_sum(ds, 16)
    assert ts.last_split_plan["levels"] == 1
    monkeypatch.setattr(ts, "_REF_BUDGET", 1)
    double = _grouped_sum(ds, 16)
    assert ts.last_split_plan["levels"] == 2
    assert ts.last_split_plan["n_groups"] >= 2
    plan = ts.last_split_plan
    assert (
        plan["driver_refs"]
        == plan["n_tasks"] * plan["n_groups"] + plan["n_buckets"]
    )
    assert single.equals(double)


def test_two_level_plan_ref_reduction():
    """At real scale (T=64 tasks, B=4096 byte-sized buckets, 1 TB exchanged)
    the two-level plan must land under budget and far below T×B refs."""
    t, b, nbytes = 64, 4096, 1 << 40
    n_groups, b_adj = ts.two_level_plan(t, b, nbytes)
    assert b_adj % n_groups == 0 and b_adj >= b
    two_level_refs = t * n_groups + b_adj
    assert two_level_refs < (t * b) // 2
    # one group's bytes stay within the level-2 worker heap bound
    assert nbytes / n_groups <= ts._MAX_GROUP_BYTES
    # under budget → no second level
    assert ts.two_level_plan(8, 16, 1 << 30) is None


def test_exchange_join_two_level_parity(ray_session, monkeypatch):
    from radiant_portal_pipeline_ray.stages.hashjoin import hash_partitioned_join

    rng = np.random.default_rng(11)
    lt = pa.table(
        {
            "k": pa.array(rng.integers(0, 300, 4000), type=pa.int64()),
            "lv": pa.array(np.arange(4000), type=pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.integers(0, 300, 900), type=pa.int64()),
            "rv": pa.array(np.arange(900), type=pa.int64()),
        }
    )
    left = rd.from_arrow(lt).repartition(6)
    right = rd.from_arrow(rt).repartition(4)

    def run():
        out = hash_partitioned_join(left, right, left_on="k", how="inner")
        t = pa.concat_tables(ray.get(out.to_arrow_refs()))
        import pyarrow.compute as pc

        return t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("k", "ascending"),
                    ("lv", "ascending"),
                    ("rv", "ascending"),
                ],
            )
        )

    base = run()
    monkeypatch.setattr(ts, "_REF_BUDGET", 1)
    forced = run()
    assert ts.last_split_plan["levels"] == 2
    assert base.equals(forced)


def test_cdc_apply_two_level_parity(ray_session, tmp_path, monkeypatch):
    """The replay fixture committed through the two-level CDC exchange must
    byte-match the single-level commit (VERDICT r3 'done' criterion)."""
    import pyarrow.compute as pc

    from radiant_portal_pipeline_ray.config import EngineConfig
    from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
    from radiant_portal_pipeline_ray.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=900, n_events=4500, n_batches=3, seed=21),
    )

    def replay(lake):
        eng = CdcEngine(str(tmp_path / lake), EngineConfig(n_parts=16))
        for p in paths:
            eng.apply([p])
        t = eng.snapshot_table()
        return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))

    base = replay("single")
    calls = []
    orig = ts.fan_subsplit

    def spy(mat, keys, n_buckets, n_groups):
        calls.append((len(mat), n_buckets, n_groups))
        return orig(mat, keys, n_buckets, n_groups)

    monkeypatch.setattr(ts, "_REF_BUDGET", 1)
    monkeypatch.setattr(ts, "fan_subsplit", spy)
    forced = replay("double")
    assert calls, "two-level CDC exchange never activated under budget=1"
    for _n_tasks, n_buckets, n_groups in calls:
        assert n_buckets % n_groups == 0
    assert base.equals(forced)


def test_split_refs_empty_input(ray_session):
    cols, nb = ts._split_refs([], ["k"], 8, 0)
    assert nb == 8 and cols == [[] for _ in range(8)]
    # downstream kernel sees a typed empty table
    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    out = ray.get(
        ts.bucket_apply_task.remote(lambda t: t, cols[0], schema)
    )
    assert out.num_rows == 0 and out.schema == schema


def test_exchange_join_schema_none_raises(ray_session):
    left = rd.from_arrow_refs([])  # zero blocks → no schema
    right = rd.from_arrow(_table(100))
    with pytest.raises(ValueError, match="zero blocks"):
        ts.exchange_join(left, right, ["k"], ["k"], 8, lambda a, b: a)


def test_connected_components_chain_pointer_jumping(ray_session):
    """A 200-node path graph has diameter 200; pointer jumping must converge
    in O(log n) rounds (ADVICE r4: non-converged labels were silently wrong)."""
    from radiant_portal_pipeline_ray.pipelines.dedup import (
        connected_components_distributed,
    )

    n = 200
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(np.arange(n - 1), type=pa.int64()),
                "doc_b": pa.array(np.arange(1, n), type=pa.int64()),
            }
        )
    )
    labels = connected_components_distributed(pairs, max_iters=12)
    t = pa.concat_tables(ray.get(labels.to_arrow_refs()))
    assert t.num_rows == n
    assert set(t.column("rep_doc_id").to_pylist()) == {0}

    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_distributed(pairs, max_iters=1)

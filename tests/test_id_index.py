import pyarrow as pa

from radiant_portal_pipeline_ray.state.id_index import (
    IdAssignStage,
    create_index_pool,
)


def test_assign_insert_if_absent(ray_session):
    import ray

    pool = create_index_pool([0, 1], shift=40)
    a = ray.get(pool[0].assign.remote(["k1", "k2", "k1"]))
    assert a[0] == a[2] != a[1]
    assert a[0] >> 40 == 0
    b = ray.get(pool[1].assign.remote(["k1"]))
    assert b[0] >> 40 == 1  # disjoint range, no coordination
    # re-assign keeps ids
    again = ray.get(pool[0].assign.remote(["k2"]))
    assert again[0] == a[1]
    assert ray.get(pool[0].lookup.remote(["k1", "zz"])) == [a[0], None]
    assert ray.get(pool[0].contains.remote(["zz", "k2"])) == [False, True]


def test_bootstrap_and_snapshot(ray_session):
    import ray

    pool = create_index_pool([3], shift=40)
    base = 3 << 40
    ray.get(pool[3].bootstrap.remote(["a", "b"], [base + 0, base + 1]))
    assert ray.get(pool[3].assign.remote(["c"]))[0] == base + 2
    keys, ids, seq = ray.get(pool[3].snapshot.remote())
    assert set(keys) == {"a", "b", "c"} and seq == 3


def test_id_assign_stage_on_dataset(ray_session):
    import ray.data as rd

    pool = create_index_pool([0, 1], shift=40)
    t = pa.table(
        {
            "url_hash": pa.array(["h1", "h2", "h3", "h1"]),
            "part": pa.array([0, 1, 0, 0], type=pa.int32()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            IdAssignStage(pool, "url_hash"), batch_format="pyarrow", batch_size=2
        )
        .take_all()
    )
    by_key = {}
    for r in out:
        by_key.setdefault((r["url_hash"], r["part"]), set()).add(r["doc_id"])
    # same (key, part) → same id even across batches
    assert all(len(v) == 1 for v in by_key.values())
    assert next(iter(by_key[("h2", 1)])) >> 40 == 1

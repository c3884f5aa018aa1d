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


def test_sharded_index_fuzz_vs_dict_model():
    """Local _ShardedIndex vs a plain-dict model over random op sequences."""
    import numpy as np

    from radiant_portal_pipeline_ray.state.id_index import _ShardedIndex

    rng = np.random.default_rng(7)
    s = _ShardedIndex(base=5 << 40)
    model: dict[str, int] = {}
    seq = 0
    for _ in range(30):  # 30 batches → exercises shard merging (>8 shards)
        keys = [f"k{int(i)}" for i in rng.integers(0, 400, rng.integers(1, 200))]
        got = s.assign(keys)
        for k, g in zip(keys, got):
            if k in model:
                assert model[k] == g, k
            else:
                assert g == (5 << 40) + seq
                model[k] = int(g)
                seq += 1
    probe = [f"k{i}" for i in range(450)]
    ids = s.probe(probe)
    for k, i in zip(probe, ids):
        assert model.get(k, -1) == i
    ks, vs, sq = s.snapshot()
    assert dict(zip(ks, vs)) == model and sq == seq

    # snapshot → bootstrap round-trip into a fresh index
    s2 = _ShardedIndex(base=5 << 40)
    s2.bootstrap(ks, vs)
    assert s2.assign([ks[0], "brand-new"]).tolist() == [
        model[ks[0]],
        (5 << 40) + seq,
    ]


def test_dedupe_pairs_collision_fallback_parity():
    import numpy as np

    from radiant_portal_pipeline_ray.state.id_index import (
        _dedupe_pairs,
        _dedupe_pairs_py,
    )

    # lane-1 collisions (same h1, different h2) force the exact fallback
    h1 = np.array([5, 5, 7, 5, 7, 5, 9], dtype=np.uint64)
    h2 = np.array([1, 2, 3, 1, 3, 2, 9], dtype=np.uint64)
    for keep in ("first", "last"):
        rf, invf = _dedupe_pairs(h1, h2, keep)
        rp, invp = _dedupe_pairs_py(h1, h2, keep)
        assert rf.tolist() == rp.tolist()
        assert invf.tolist() == invp.tolist()


def test_assign_microbench_vectorized_faster_than_dict_loop():
    """The vectorized index must beat a per-key dict loop on 1M-key batches
    (quiet-host speedup ~5-10x; the gate is loose for noisy CI hosts)."""
    import time

    import numpy as np
    import pyarrow as pa

    from radiant_portal_pipeline_ray.state.id_index import _ShardedIndex

    rng = np.random.default_rng(0)
    k1 = pa.array([f"url-{int(i)}" for i in rng.integers(0, 700_000, 1_000_000)])
    k2 = pa.array(
        [f"url-{int(i)}" for i in rng.integers(300_000, 1_000_000, 1_000_000)]
    )

    def dict_assign(idx, seq, base, keys):
        out = []
        for k in keys.to_pylist():
            i = idx.get(k)
            if i is None:
                i = base + seq
                seq += 1
                idx[k] = i
            out.append(i)
        return out, seq

    # interleaved best-of-2 per implementation: co-tenant noise on CI hosts
    # spikes either leg; the min is the capability number
    t_dict, t_shard = [], []
    a1 = a2 = b1 = b2 = None
    for _ in range(2):
        d: dict[str, int] = {}
        seq = 0
        t0 = time.perf_counter()
        a1, seq = dict_assign(d, seq, 0, k1)
        a2, seq = dict_assign(d, seq, 0, k2)
        t_dict.append(time.perf_counter() - t0)

        s = _ShardedIndex(0)
        t0 = time.perf_counter()
        b1 = s.assign(k1)
        b2 = s.assign(k2)
        t_shard.append(time.perf_counter() - t0)

    assert a1 == b1.tolist() and a2 == b2.tolist()
    lo_d, lo_s = min(t_dict), min(t_shard)
    print(f"dict {lo_d:.2f}s sharded {lo_s:.2f}s x{lo_d / lo_s:.1f}")
    assert lo_s < lo_d, (t_dict, t_shard)

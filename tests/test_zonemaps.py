"""Manifest zone maps: per-file min/max stats recorded at write time,
driver-side file pruning at read time (state/zonemaps.py).

Correctness contract: a pruned read must EQUAL an unpruned read + filter —
pruning is a pure optimization. String max bounds are prefix-truncated and
must round UP (a truncated-down max would wrongly prune files holding
strings above the prefix)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)
from radiant_portal_pipeline_ray.state.zonemaps import (
    file_prunable,
    file_stats,
    plan_files,
    trunc_max,
    trunc_min,
)

# ---------------------------------------------------------------- unit


def test_trunc_max_rounds_up():
    s = "a" * 40
    assert trunc_min(s) == "a" * 32
    # truncated max must be STRICTLY above every string sharing the prefix
    m = trunc_max(s)
    assert m == "a" * 31 + "b"
    assert m > s
    # short strings pass through exactly
    assert trunc_max("abc") == "abc"
    # all-maximal prefix has no finite upper bound
    assert trunc_max(chr(0x10FFFF) * 40) is None


def test_file_stats_and_prunable():
    t = pa.table(
        {
            "url": pa.array(["http://b.com/x", "http://m.com/y"]),
            "warc_ts": pa.array(
                np.array([1_000_000, 5_000_000], dtype="datetime64[us]")
            ),
            "lsn": pa.array([10, 20], type=pa.int64()),
        }
    )
    st = file_stats(t)
    assert st["lsn"] == [10, 20]
    assert st["url"][0] == "http://b.com/x"
    # interval fully above the file's lsn range → prunable
    assert file_prunable(st, {"lsn": (21, None)})
    assert file_prunable(st, {"lsn": (None, 9)})
    assert not file_prunable(st, {"lsn": (15, None)})
    # url above the max → prunable; inside → keep
    assert file_prunable(st, {"url": ("http://z", None)})
    assert not file_prunable(st, {"url": ("http://c", None)})
    # missing stats / columns are never pruned
    assert not file_prunable(None, {"lsn": (99, None)})
    assert not file_prunable({"lsn": [0, 5]}, {"url": ("z", None)})
    # warc_ts accepts datetime64 endpoints
    assert file_prunable(st, {"warc_ts": (np.datetime64(6_000_000, "us"), None)})


def test_trunc_max_never_underprunes():
    # a file whose true max extends beyond the 32-char prefix must NOT be
    # prunable for queries targeting the suffix region
    long_url = "http://site.example.com/path/" + "z" * 40
    t = pa.table({"url": pa.array([long_url]), "lsn": pa.array([1])})
    st = file_stats(t)
    assert not file_prunable(st, {"url": (long_url, long_url)})


# ------------------------------------------------------------ integration


def test_lake_prune_equals_filter(ray_session, tmp_lake, tmp_path):
    spec = ChangelogSpec(n_urls=400, n_events=2000, n_batches=2, seed=7)
    paths = generate_changelog(str(tmp_path / "cl"), spec)
    eng = CdcEngine(tmp_lake, EngineConfig(n_parts=4, target_rows_per_file=64))
    eng.apply(paths)

    man = eng.lake.current_manifest()
    # every committed partition carries stats aligned with its files
    for st in man.partitions.values():
        assert st.stats is not None and len(st.stats) == len(st.files)

    full = eng.read_snapshot().take_all()
    key = lambda r: (r["url"], r["lsn"])

    # lsn prune: correctness only (merge output is url-sorted, so lsn zone
    # maps are wide — pruning may find nothing; the result must still be
    # exactly the filtered state)
    lsns = sorted(r["lsn"] for r in full)
    lo = lsns[len(lsns) // 2]
    got = eng.read_snapshot(prune={"lsn": (lo, None)}).take_all()
    want = [r for r in full if r["lsn"] >= lo]
    assert sorted(map(key, got)) == sorted(map(key, want))

    # url-range prune: merge writes url-sorted chunks, so a narrow interval
    # MUST skip files from the manifest alone (target_rows_per_file=64 →
    # many files per partition)
    urls = sorted(r["url"] for r in full)
    u_lo, u_hi = urls[len(urls) // 3], urls[len(urls) // 3 + 5]
    kept, pruned = plan_files(man, {"url": (u_lo, u_hi)})
    assert pruned > 0
    assert len(kept) + pruned == sum(len(s.files) for s in man.partitions.values())
    got = eng.read_snapshot(prune={"url": (u_lo, u_hi)}).take_all()
    want = [r for r in full if u_lo <= r["url"] <= u_hi]
    assert sorted(map(key, got)) == sorted(map(key, want))


def test_compact_preserves_stats_and_sharpens_url_pruning(
    ray_session, tmp_lake, tmp_path
):
    from radiant_portal_pipeline_ray.pipelines.maintenance import compact

    spec = ChangelogSpec(n_urls=400, n_events=2000, n_batches=2, seed=11)
    paths = generate_changelog(str(tmp_path / "cl"), spec)
    eng = CdcEngine(tmp_lake, EngineConfig(n_parts=2, target_rows_per_file=64))
    eng.apply(paths)
    full = eng.snapshot_table()
    full = full.take(pc.sort_indices(full, sort_keys=[("url", "ascending")]))

    rep = compact(tmp_lake, EngineConfig(n_parts=2, target_rows_per_file=64), min_files=1)
    assert not rep["noop"]
    man = eng.lake.current_manifest()
    for st in man.partitions.values():
        assert st.stats is not None and len(st.stats) == len(st.files)

    # compact sorts by url inside each partition, so a narrow url interval
    # must prune most files
    urls = full.column("url").to_pylist()
    mid = urls[len(urls) // 2]
    kept, pruned = plan_files(man, {"url": (mid, mid)})
    total = sum(len(s.files) for s in man.partitions.values())
    assert total > 4 and pruned >= total // 2

    got = eng.read_snapshot(prune={"url": (mid, mid)}).take_all()
    assert sorted(r["url"] for r in got) == [u for u in urls if u == mid]

    # post-compact pruned read still equals filtered full state
    after = eng.snapshot_table()
    after = after.take(pc.sort_indices(after, sort_keys=[("url", "ascending")]))
    assert after.select(["url", "lsn"]).equals(full.select(["url", "lsn"]))

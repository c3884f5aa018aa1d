"""Multi-writer apply: partition-disjoint backlog jobs dispatched
CONCURRENTLY through independent CdcEngine writers, serialized only at the
manifest commit (reference analogue: one import-part run per partition
fanned in to a single committer, `radiant/dags/import_snv_vcf.py:47-49`).

Covers: both writers commit (CAS-ordered versions, the later one rebased
over the earlier), final state equality vs a sequential run, the
same-partition submission-order constraint still holding under
max_concurrency, and the routing-divergence recovery path (both writers
salt → later commit conflicts → job re-runs sequentially, state intact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.schemas import CHANGELOG_SCHEMA

_US = 1_000_000
_T0 = 1_704_067_200 * _US


def _write_batch(path: str, domain: str, lsn0: int, n: int) -> str:
    lsn = np.arange(lsn0, lsn0 + n, dtype=np.int64)
    urls = [f"https://{domain}/p/{i:06d}" for i in range(n)]
    t = pa.Table.from_pydict(
        {
            "lsn": pa.array(lsn),
            "op": pa.array(["I"] * n),
            "url": pa.array(urls),
            "warc_ts": pa.array(
                (_T0 + lsn * _US).astype("datetime64[us]"), pa.timestamp("us")
            ),
            "html": pa.array(
                [f"<html><body>{u}</body></html>".encode() for u in urls],
                pa.binary(),
            ),
            "text": pa.array([""] * n),
            "lang": pa.array(["en"] * n),
        },
        schema=CHANGELOG_SCHEMA,
    )
    pq.write_table(t, path)
    return path


# domains below land in DISTINCT partitions at n_parts=4 (same choices as
# test_qa_priority.py: aaa.org→1, aab.org→2, aad.org→0)
def _jobs(base, n=60, lsn0=1):
    base.mkdir(parents=True, exist_ok=True)
    return [
        {
            "paths": [
                _write_batch(str(base / "a.parquet"), "aaa.org", lsn0, n)
            ],
            "priority": 10,
        },
        {
            "paths": [
                _write_batch(str(base / "b.parquet"), "aab.org", lsn0 + 999, n)
            ],
            "priority": 10,
        },
    ]


def _state(eng) -> list[tuple]:
    t = eng.snapshot_table(["url", "text", "lsn"])
    return sorted(
        zip(
            t.column("url").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lsn").to_pylist(),
        )
    )


def test_concurrent_disjoint_writers_both_commit(ray_session, tmp_path):
    cfg = EngineConfig(n_parts=4)

    seq = CdcEngine(str(tmp_path / "seq"), cfg)
    seq.apply_backlog(_jobs(tmp_path / "cl_seq"))

    con = CdcEngine(str(tmp_path / "con"), cfg)
    reports = con.apply_backlog(_jobs(tmp_path / "cl_con"), max_concurrency=2)

    # both writers committed: two manifest versions, CAS-ordered
    assert sorted(r["version"] for r in reports) == [1, 2]
    assert all(r["rows_upserted"] == 60 for r in reports)
    assert con.lake.current_manifest().version == 2
    # the later commit rebased over the earlier writer's version — its
    # parent chain includes both txns
    m2 = con.lake.read_manifest(2)
    m1 = con.lake.read_manifest(1)
    assert m2.parent_version == 1
    assert m1.txn_id != m2.txn_id
    # the rebase preserved the earlier writer's partition state: the final
    # manifest carries BOTH writers' partitions with their files and rows
    live_parts = {p for p, st in m2.partitions.items() if st.rows > 0}
    assert len(live_parts) == 2
    assert all(m2.partitions[p].files for p in live_parts)
    assert sum(m2.partitions[p].rows for p in live_parts) == 120

    # replay equality vs the sequential run
    assert _state(con) == _state(seq)
    assert len(_state(con)) == 120


def test_concurrent_wave_respects_same_partition_order(ray_session, tmp_path):
    """A third job sharing job 0's partition must wait for job 0's commit
    even when a concurrency slot is free."""
    cl = tmp_path / "cl"
    cl.mkdir()
    jobs = _jobs(cl) + [
        {
            # same domain as job 0 → same partition; updates its urls
            "paths": [_write_batch(str(cl / "c.parquet"), "aaa.org", 5000, 60)],
            "priority": 0,  # best priority, but must still run after job 0
        }
    ]
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    reports = eng.apply_backlog(jobs, max_concurrency=3)
    order = [r["job_index"] for r in reports]
    assert order.index(0) < order.index(2)
    # job 2's updates won LWW over job 0's inserts (same urls, higher lsn)
    state = _state(eng)
    assert len(state) == 120
    lsn_by_url = {u: l for u, _, l in state}
    assert all(
        lsn_by_url[f"https://aaa.org/p/{i:06d}"] >= 5000 for i in range(60)
    )


def test_concurrent_salting_divergence_recovers(ray_session, tmp_path):
    """Both concurrent writers exceed the salt threshold → both try to
    publish new routing state → the later commit raises
    ConcurrentWriterConflict internally and the job re-runs sequentially;
    the final state is identical to a sequential backlog."""
    cfg = EngineConfig(
        n_parts=4, salt_threshold_rows=20, salt_target_rows=10
    )
    seq = CdcEngine(str(tmp_path / "seq"), cfg)
    seq.apply_backlog(_jobs(tmp_path / "cl_seq"))

    con = CdcEngine(str(tmp_path / "con"), cfg)
    reports = con.apply_backlog(_jobs(tmp_path / "cl_con"), max_concurrency=2)
    assert len(reports) == 2
    man = con.lake.current_manifest()
    # every hot domain's salting decision survived the conflict/retry
    assert set(man.pending_migrations) >= {"aaa.org", "aab.org"} or set(
        man.salt_map
    ) >= {"aaa.org", "aab.org"}
    assert _state(con) == _state(seq)

    # a follow-up round (fresh lsns above the watermark) executes the
    # pending migrations cleanly on both
    nxt_s = _jobs(tmp_path / "cl_seq2", n=30, lsn0=5000)
    nxt_c = _jobs(tmp_path / "cl_con2", n=30, lsn0=5000)
    seq.apply_backlog(nxt_s)
    con.apply_backlog(nxt_c, max_concurrency=2)
    assert _state(con) == _state(seq)

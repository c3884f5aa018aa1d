"""Cross-table QA exclusivity check + priority-ordered apply backlog (W4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.schemas import CHANGELOG_SCHEMA
from radiant_portal_pipeline_ray.stages.qa import cross_exclusive

_US = 1_000_000
_T0 = 1_704_067_200 * _US


def test_cross_exclusive_detects_overlap(ray_session):
    a = rd.from_arrow(pa.table({"k": [1, 2, 3, 4]}))
    b = rd.from_arrow(pa.table({"k": [4, 5, 6]}))
    bad = cross_exclusive(a, b, "k")
    assert bad["ok"] is False and "shared_keys=1" in bad["detail"]
    c = rd.from_arrow(pa.table({"k": [7, 8]}))
    good = cross_exclusive(a, c, "k")
    assert good["ok"] is True


def test_apply_runs_cross_table_qa(ray_session, tmp_path):
    from radiant_portal_pipeline_ray.sources.generator import (
        ChangelogSpec,
        generate_changelog,
    )

    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=150, n_events=800, n_batches=1, delete_ratio=0.2),
    )
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=2, run_qa=True))
    rep = eng.apply(paths)
    assert rep["qa"]["checks"]["live_tombstone_exclusive"]["ok"] is True
    assert rep["qa"]["passed"] is True


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


def test_apply_backlog_priority_order(ray_session, tmp_path):
    """Partition-scoped jobs execute lowest-priority-first; the final state
    contains every job's rows regardless of order."""
    # domains chosen to land in DISTINCT partitions (parts 1/2/0 of 4):
    # priority reordering is partition-scoped, exactly like the reference's
    # per-partition import runs — same-partition jobs must stay in lsn order
    jobs = [
        {"paths": [_write_batch(str(tmp_path / "a.parquet"), "aaa.org", 1, 40)],
         "priority": 30},
        {"paths": [_write_batch(str(tmp_path / "b.parquet"), "aab.org", 100, 40)],
         "priority": 10},
        {"paths": [_write_batch(str(tmp_path / "c.parquet"), "aad.org", 200, 40)],
         "priority": 20},
    ]
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    reports = eng.apply_backlog(jobs)
    assert [r["job_index"] for r in reports] == [1, 2, 0]  # by priority
    assert [r["priority"] for r in reports] == [10, 20, 30]
    snap = eng.snapshot_table(["url"])
    assert snap.num_rows == 120


def test_apply_backlog_same_partition_stays_in_submission_order(
    ray_session, tmp_path
):
    """Priority can NEVER reorder two jobs that touch the same partition —
    the scheduler probes each job's partitions and holds the later-submitted
    job back, else the per-partition watermark would drop its events."""
    jobs = [
        # same domain (same partition), lsns 1..40 then 41..80 — the SECOND
        # job has the better priority but must still run second
        {"paths": [_write_batch(str(tmp_path / "a1.parquet"), "aaa.org", 1, 40)],
         "priority": 50},
        {"paths": [_write_batch(str(tmp_path / "a2.parquet"), "aaa.org", 100, 40)],
         "priority": 1},
        # unrelated partition, middle priority → runs first
        {"paths": [_write_batch(str(tmp_path / "b.parquet"), "aab.org", 200, 40)],
         "priority": 10},
    ]
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    reports = eng.apply_backlog(jobs)
    assert [r["job_index"] for r in reports] == [2, 0, 1]
    snap = eng.snapshot_table(["url"])
    # nothing dropped: 40 urls per aaa job are distinct batches? same urls
    # p/000000..39 twice -> 40 aaa urls + 40 aab urls
    assert snap.num_rows == 80

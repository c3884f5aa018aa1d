"""End-to-end composition: the WAL tail drains arriving changelog files,
incremental checksums track every commit at O(changed) cost, the change
feed explains exactly what moved between versions, and rollback + re-drain
recovers the head state — the full CDC product in one scenario."""

import pyarrow.parquet as pq

from radiant_portal_pipeline_ray import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.pipelines.tail import tail
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def _cks(t):
    return t.to_pandas().set_index("part").sort_index()


def test_tail_checksums_changefeed_rollback(tmp_path, ray_session):
    import os
    import shutil

    stage = tmp_path / "pending"
    live = tmp_path / "cl"
    live.mkdir()
    paths = generate_changelog(
        str(stage), ChangelogSpec(n_urls=500, n_events=2500, n_batches=3, seed=43)
    )

    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=8))

    # round 1: one file arrives, the tail drains it
    shutil.copy(paths[0], live / os.path.basename(paths[0]))
    r1 = tail(eng, str(live), poll_s=0.0, idle_exit=1)
    assert len(r1) == 1
    v1 = eng.lake.current_manifest().version
    c1 = eng.snapshot_checksums()

    # rounds 2+3 arrive; the tail's consumed-inputs ledger skips file 1
    for p in paths[1:]:
        shutil.copy(p, live / os.path.basename(p))
    r2 = tail(eng, str(live), poll_s=0.0, idle_exit=1)
    assert len(r2) >= 1
    v2 = eng.lake.current_manifest().version
    assert v2 > v1

    # incremental checksums at O(changed) equal the full recompute
    c2_inc = eng.snapshot_checksums_incremental(v1, c1)
    c2_full = eng.snapshot_checksums()
    assert _cks(c2_inc).equals(_cks(c2_full))

    # the change feed explains the delta: every fed url's lsn_to matches
    # the live row (for I/U), and D urls are gone from the snapshot
    feed = eng.read_changes(v1, v2).to_pandas()
    assert len(feed) > 0
    snap = eng.snapshot_table(columns=["url", "lsn"]).to_pandas()
    live_lsn = dict(zip(snap["url"], snap["lsn"]))
    for _, row in feed.iterrows():
        if row["change_op"] in ("I", "U"):
            assert live_lsn[row["url"]] == row["lsn_to"]
        else:
            assert row["url"] not in live_lsn

    # rollback to v1: the ledger reverts, so a re-drain re-applies 2+3 and
    # converges back to the head state (content identity via checksums —
    # doc_id is per-history, and checksums hash url|lsn|text)
    eng.rollback(v1)
    assert _cks(eng.snapshot_checksums()).equals(_cks(c1))
    r3 = tail(eng, str(live), poll_s=0.0, idle_exit=1)
    assert len(r3) >= 1

    def _content(e):
        t = e.snapshot_table(columns=["url", "lsn", "text"])
        return t.sort_by("url").to_pandas().reset_index(drop=True)

    head = CdcEngine(str(tmp_path / "lake_head"), EngineConfig(n_parts=8))
    head.apply(paths)
    import pandas as pd

    pd.testing.assert_frame_equal(_content(eng), _content(head))

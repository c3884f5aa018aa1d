"""WAL tail loop: exactly-once file consumption via the manifest ledger,
footer-proof skipping after pruning, crash-resume, CLI drain mode."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.pipelines.tail import (
    input_max_lsn,
    pending_inputs,
    tail,
)
from radiant_portal_pipeline_ray.schemas import CHANGELOG_SCHEMA

_US = 1_000_000
_T0 = 1_704_067_200 * _US


def _write_batch(path, lsn_start, n, n_urls=64):
    """n insert/update events over a small url universe (covers all
    partitions so the min watermark advances with every batch)."""
    lsn = np.arange(lsn_start, lsn_start + n, dtype=np.int64)
    urls = [f"https://d{i % 8}.example.org/p/{i % n_urls:04d}" for i in lsn]
    html = pa.array(
        [f"<html><body>doc {u} at {l}</body></html>".encode() for u, l in zip(urls, lsn)],
        pa.binary(),
    )
    from radiant_portal_pipeline_ray.functions.text import extract_text

    t = pa.Table.from_pydict(
        {
            "lsn": pa.array(lsn),
            "op": pa.array(["I"] * n),
            "url": pa.array(urls),
            "warc_ts": pa.array(
                (_T0 + lsn * _US).astype("datetime64[us]"), pa.timestamp("us")
            ),
            "html": html,
            "text": extract_text(html),
            "lang": pa.array(["en"] * n),
        },
        schema=CHANGELOG_SCHEMA,
    )
    pq.write_table(t, str(path))
    return str(path)


def test_tail_consumes_each_file_once(ray_session, tmp_path):
    cl = tmp_path / "cl"
    cl.mkdir()
    _write_batch(cl / "b0000.parquet", 0, 200)
    _write_batch(cl / "b0001.parquet", 200, 200)
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))

    reports = tail(eng, str(cl), poll_s=0.0, idle_exit=1)
    assert len(reports) == 1  # backlog drained in one round (both files)
    assert sorted(reports[0]["consumed_files"]) == ["b0000.parquet", "b0001.parquet"]
    v1 = eng.lake.current_manifest().version

    # nothing new → no applies, version unchanged
    assert tail(eng, str(cl), poll_s=0.0, idle_exit=1) == []
    assert eng.lake.current_manifest().version == v1

    # a new file arrives → exactly one more round consuming only it
    _write_batch(cl / "b0002.parquet", 400, 100)
    reports = tail(eng, str(cl), poll_s=0.0, idle_exit=1)
    assert len(reports) == 1
    assert reports[0]["consumed_files"] == ["b0002.parquet"]
    assert eng.lake.current_manifest().version == v1 + 1


def test_ledger_pruned_by_watermark_and_footer_proof(ray_session, tmp_path):
    cl = tmp_path / "cl"
    cl.mkdir()
    p0 = _write_batch(cl / "b0000.parquet", 0, 200)
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    tail(eng, str(cl), poll_s=0.0, idle_exit=1)
    man = eng.lake.current_manifest()
    # every partition saw lsns up to ~199; min watermark < 199 only if some
    # partition's max is lower — b0000 stays while min_wm < its max
    assert input_max_lsn(p0) == 199

    # batch 2 pushes every partition's watermark past 199 → b0000's ledger
    # entry must be pruned, and the footer proof must still skip the file
    _write_batch(cl / "b0001.parquet", 200, 400)
    tail(eng, str(cl), poll_s=0.0, idle_exit=1)
    man = eng.lake.current_manifest()
    assert man.min_watermark() >= 199
    assert "b0000.parquet" not in man.consumed_inputs
    assert pending_inputs(eng, str(cl)) == []  # footer-proof skip

    # crash-resume: a FRESH engine (new process analogue) sees the same state
    eng2 = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    assert tail(eng2, str(cl), poll_s=0.0, idle_exit=1) == []


def test_old_manifest_without_ledger_loads(ray_session, tmp_path):
    """Manifests committed before the ledger existed must round-trip."""
    from radiant_portal_pipeline_ray.state.manifest import Manifest

    cl = tmp_path / "cl"
    cl.mkdir()
    _write_batch(cl / "b0000.parquet", 0, 100)
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    eng.apply([str(cl / "b0000.parquet")])
    man_path = eng.lake._manifest_path(eng.lake.current_version())
    with open(man_path) as f:
        d = json.load(f)
    d.pop("consumed_inputs")
    m = Manifest.from_json(d)
    assert m.consumed_inputs == {}


def test_tail_cli_drain(ray_session, tmp_path, capsys):
    from radiant_portal_pipeline_ray.__main__ import main

    cl = tmp_path / "cl"
    cl.mkdir()
    _write_batch(cl / "b0000.parquet", 0, 150)
    rc = main(
        [
            "tail",
            "--lake",
            str(tmp_path / "lake"),
            "--changelog",
            str(cl),
            "--n-parts",
            "4",
            "--poll-s",
            "0",
            "--idle-exit",
            "1",
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    # one report line + the final {"rounds": 1}
    assert json.loads(lines[-1])["rounds"] == 1
    rep = json.loads(lines[0])
    assert rep["consumed_files"] == ["b0000.parquet"]


def test_batch_files_caps_round_size(ray_session, tmp_path):
    cl = tmp_path / "cl"
    cl.mkdir()
    for i in range(4):
        _write_batch(cl / f"b{i:04d}.parquet", i * 100, 100)
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    reports = tail(eng, str(cl), poll_s=0.0, idle_exit=1, batch_files=2)
    assert [len(r["consumed_files"]) for r in reports] == [2, 2]
    assert eng.read_snapshot().count() > 0

"""Dead-letter quarantine: malformed change events must not kill the round
or corrupt routing — they commit to a reasoned DLQ exactly alongside the
manifest."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.schemas import CHANGELOG_SCHEMA

_US = 1_000_000
_T0 = 1_704_067_200 * _US


def _write(path, rows):
    """rows: list of dicts with lsn/op/url/html (None allowed anywhere)."""
    lsn = [r.get("lsn") for r in rows]
    t = pa.Table.from_pydict(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "op": pa.array([r.get("op") for r in rows], pa.string()),
            "url": pa.array([r.get("url") for r in rows], pa.string()),
            "warc_ts": pa.array(
                [_T0 + (x or 0) * _US for x in lsn], pa.timestamp("us")
            ),
            "html": pa.array([r.get("html") for r in rows], pa.binary()),
            "text": pa.array([None] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        },
        schema=CHANGELOG_SCHEMA,
    )
    pq.write_table(t, str(path))
    return str(path)


def _mixed_rows():
    good = [
        {"lsn": i, "op": "I", "url": f"https://ok.org/p/{i}",
         "html": f"<p>doc {i}</p>".encode()}
        for i in range(1, 21)
    ]
    bad = [
        {"lsn": 100, "op": "I", "url": None, "html": b"<p>x</p>"},     # null_url
        {"lsn": 101, "op": "I", "url": "", "html": b"<p>x</p>"},       # null_url
        {"lsn": 102, "op": "Z", "url": "https://ok.org/p/1", "html": b"x"},  # bad_op
        {"lsn": None, "op": "I", "url": "https://ok.org/p/2", "html": b"x"},  # bad_lsn
        {"lsn": -7, "op": "U", "url": "https://ok.org/p/3", "html": b"x"},   # bad_lsn
        {"lsn": 103, "op": "I", "url": "https://ok.org/p/4", "html": None},  # null_html
    ]
    return good, bad


def test_mixed_batch_quarantines_and_commits(ray_session, tmp_path):
    good, bad = _mixed_rows()
    p = _write(tmp_path / "cl.parquet", good + bad)
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    rep = eng.apply([p])
    assert rep["rows_quarantined"] == len(bad)
    assert rep["quarantine"]["by_reason"] == {
        "null_url": 2, "bad_op": 1, "bad_lsn": 2, "null_html": 1,
    }
    assert eng.read_snapshot().count() == len(good)

    q = eng.read_quarantine().take_all()
    assert len(q) == len(bad)
    reasons = sorted(r["reason"] for r in q)
    assert reasons == sorted(
        ["null_url", "null_url", "bad_op", "bad_lsn", "bad_lsn", "null_html"]
    )
    man = eng.lake.current_manifest()
    assert len(man.quarantine_files) == 1
    assert man.metrics["last_apply"]["rows_quarantined"] == len(bad)

    # gc must keep the referenced quarantine file
    removed = eng.lake.gc_orphans(keep_versions=1, staging_age_s=0.0)
    assert not any("quarantine" in r for r in removed)
    assert eng.read_quarantine().count() == len(bad)


def test_all_malformed_batch_commits_quarantine_only(ray_session, tmp_path):
    good, bad = _mixed_rows()
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    eng.apply([_write(tmp_path / "good.parquet", good)])
    v1 = eng.lake.current_manifest().version

    rep = eng.apply([_write(tmp_path / "bad.parquet", bad)])
    assert rep["rows_quarantined"] == len(bad)
    man = eng.lake.current_manifest()
    assert man.version == v1 + 1
    assert man.metrics.get("quarantine_only") is True
    # partition state unchanged; snapshot identical
    assert eng.read_snapshot().count() == len(good)
    assert eng.read_quarantine().count() == len(bad)


def test_legacy_exchange_drops_malformed_with_warning(ray_session, tmp_path):
    good, bad = _mixed_rows()
    p = _write(tmp_path / "cl.parquet", good + bad)
    eng = CdcEngine(
        str(tmp_path / "lake"), EngineConfig(n_parts=4, exchange="sort")
    )
    rep = eng.apply([p])
    assert rep.get("rows_quarantined") is None
    assert eng.read_snapshot().count() == len(good)


def test_quarantine_files_survive_compaction(ray_session, tmp_path):
    good, bad = _mixed_rows()
    p = _write(tmp_path / "cl.parquet", good + bad)
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    eng.apply([p])
    from radiant_portal_pipeline_ray.pipelines.maintenance import compact

    compact(str(tmp_path / "lake"), min_files=1)
    eng2 = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    assert eng2.read_quarantine().count() == len(bad)

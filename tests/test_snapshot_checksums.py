"""Lake-level anti-entropy: snapshot_checksums() must be identical for two
lakes that replayed the SAME changelog in DIFFERENT batch groupings
(replay equality without comparing rows), and an extra update must change
exactly the affected partitions' checksums."""

import pyarrow.parquet as pq

from radiant_portal_pipeline_ray import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def _df(t):
    return t.to_pandas().set_index("part").sort_index()


def test_replay_equality_and_targeted_diff(tmp_path, ray_session):
    cl = str(tmp_path / "cl")
    paths = generate_changelog(
        cl, ChangelogSpec(n_urls=800, n_events=4000, n_batches=4, seed=11)
    )

    a = CdcEngine(str(tmp_path / "lake_a"), EngineConfig(n_parts=8))
    a.apply(paths[:1])
    a.apply(paths[1:3])
    a.apply(paths[3:])

    b = CdcEngine(str(tmp_path / "lake_b"), EngineConfig(n_parts=8))
    b.apply(paths)  # one shot — different rounds, same final state

    ca, cb = _df(a.snapshot_checksums()), _df(b.snapshot_checksums())
    assert ca.equals(cb)

    # one more update through lake_b only → the diff is confined to the
    # updated url's partition(s)
    import pyarrow as pa

    import pyarrow.compute as pc

    last = pq.read_table(paths[-1])
    live = last.filter(pc.not_equal(last.column("op"), "D"))
    upd = live.slice(0, 1)
    max_lsn = max(
        max(pq.read_table(p, columns=["lsn"]).column("lsn").to_pylist())
        for p in paths
    )
    upd = upd.set_column(
        upd.schema.get_field_index("lsn"),
        pa.field("lsn", pa.int64()),
        pa.array([max_lsn + 1], pa.int64()),
    )
    upd = upd.set_column(
        upd.schema.get_field_index("op"),
        pa.field("op", pa.string()),
        pa.array(["U"], pa.string()),
    )
    extra = tmp_path / "cl_extra.parquet"
    pq.write_table(upd, extra)
    b.apply([str(extra)])

    cb2 = _df(b.snapshot_checksums())
    changed = (ca["checksum_lo"] != cb2["checksum_lo"]) | (
        ca["checksum_hi"] != cb2["checksum_hi"]
    )
    assert 1 <= changed.sum() <= 2  # the url's partition (± salt slot)

    # time travel: the pre-update version's checksums are still the old ones
    v_before = b.lake.current_manifest().version - 1
    assert _df(b.snapshot_checksums(version=v_before)).equals(cb)


def test_incremental_checksums_match_full(tmp_path, ray_session):
    cl = str(tmp_path / "cl")
    paths = generate_changelog(
        cl, ChangelogSpec(n_urls=600, n_events=3000, n_batches=3, seed=23)
    )
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=8))
    eng.apply(paths[:1])
    v1 = eng.lake.current_manifest().version
    c1 = eng.snapshot_checksums()
    eng.apply(paths[1:])
    v2 = eng.lake.current_manifest().version
    assert v2 > v1
    inc = eng.snapshot_checksums_incremental(v1, c1)
    full = eng.snapshot_checksums()
    assert inc.to_pandas().equals(full.to_pandas())


def test_incremental_reuses_unchanged_partitions(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc

    cl = str(tmp_path / "cl")
    paths = generate_changelog(
        cl, ChangelogSpec(n_urls=600, n_events=3000, n_batches=3, seed=29)
    )
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=8))
    eng.apply(paths)
    v1 = eng.lake.current_manifest().version
    c1 = eng.snapshot_checksums()

    # a single-row update touches one partition
    last = pq.read_table(paths[-1])
    live = last.filter(pc.not_equal(last.column("op"), "D")).slice(0, 1)
    max_lsn = max(
        max(pq.read_table(p, columns=["lsn"]).column("lsn").to_pylist())
        for p in paths
    )
    upd = live.set_column(
        live.schema.get_field_index("lsn"),
        pa.field("lsn", pa.int64()),
        pa.array([max_lsn + 1], pa.int64()),
    )
    upd = upd.set_column(
        upd.schema.get_field_index("op"),
        pa.field("op", pa.string()),
        pa.array(["U"], pa.string()),
    )
    extra = tmp_path / "extra.parquet"
    pq.write_table(upd, extra)
    eng.apply([str(extra)])

    # parity with the full recompute
    inc = eng.snapshot_checksums_incremental(v1, c1)
    full = eng.snapshot_checksums()
    assert inc.to_pandas().equals(full.to_pandas())

    # doctor the prior with sentinels: they must survive into the result
    # for every UNCHANGED partition — proof those partitions never rescan
    doctored = c1.set_column(
        c1.schema.get_field_index("checksum_lo"),
        pa.field("checksum_lo", pa.int64()),
        pa.array([-1] * c1.num_rows, pa.int64()),
    )
    inc2 = eng.snapshot_checksums_incremental(v1, doctored).to_pandas()
    n_sentinel = (inc2["checksum_lo"] == -1).sum()
    assert n_sentinel >= len(inc2) - 2  # all but the touched partition(s)
    assert n_sentinel < len(inc2)  # and the touched one WAS recomputed


def test_checksum_fingerprint_stamped_and_verified(tmp_path, ray_session):
    """ADVICE r4: checksum tables carry a hash-implementation canary; a
    prior built by a DIFFERENT implementation (e.g. polars upgrade changed
    xx64) is refused for incremental reuse instead of silently mixed."""
    import json

    import pytest

    from radiant_portal_pipeline_ray.stages.qa import (
        ChecksumFingerprintMismatch,
        checksum_fingerprint,
        verify_checksum_fingerprint,
    )

    cl = str(tmp_path / "cl")
    paths = generate_changelog(
        cl, ChangelogSpec(n_urls=300, n_events=1200, n_batches=2, seed=7)
    )
    eng = CdcEngine(str(tmp_path / "lake"), EngineConfig(n_parts=4))
    eng.apply(paths[:1])
    prior = eng.snapshot_checksums(version=1)
    meta = prior.schema.metadata
    assert json.loads(meta[b"checksum_fingerprint"]) == checksum_fingerprint()
    assert verify_checksum_fingerprint(prior) == "xx64"

    eng.apply(paths[1:])

    # matching fingerprint: incremental reuse works and stays stamped
    inc = eng.snapshot_checksums_incremental(1, prior)
    assert inc.schema.metadata and b"checksum_fingerprint" in inc.schema.metadata
    assert _df(inc).equals(_df(eng.snapshot_checksums()))

    # tampered fingerprint (simulated upgrade): refused, not mixed
    bad_meta = dict(meta)
    bad_meta[b"checksum_fingerprint"] = json.dumps([1, 2, 3, 4, 5]).encode()
    with pytest.raises(ChecksumFingerprintMismatch):
        eng.snapshot_checksums_incremental(1, prior.replace_schema_metadata(bad_meta))

    # unstamped prior (older build): also refused
    with pytest.raises(ChecksumFingerprintMismatch):
        eng.snapshot_checksums_incremental(1, prior.replace_schema_metadata())

    # md5 is the version-stable path and fingerprints independently
    assert checksum_fingerprint("md5") != checksum_fingerprint("xx64")

"""Property-based schema evolution: random sequences of extra columns —
appearing, disappearing (drop ⇒ retained as nulls), and widening
(int32→int64, float→double) across rounds — must replay to exactly the
per-url values of the LAST event, with absent-at-that-event columns null,
for ANY evolution order."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from radiant_portal_pipeline_ray import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine

# per round: which of three optional columns are present, and the integer
# column's width (widen-only unification must cope with any order)
round_strategy = st.lists(
    st.tuples(
        st.booleans(),  # has col 'score' (int)
        st.booleans(),  # has col 'note' (string)
        st.sampled_from(["int32", "int64"]),  # score width this round
    ),
    min_size=2,
    max_size=4,
)


def _mk_batch(round_no, n_urls, spec, lsn0):
    has_score, has_note, width = spec
    n = n_urls
    cols = {
        "lsn": pa.array(range(lsn0, lsn0 + n), pa.int64()),
        "op": pa.array(["U"] * n, pa.string()),
        "url": pa.array(
            [f"https://d0.example.net/doc/{i:04d}" for i in range(n)], pa.string()
        ),
        "warc_ts": pa.array([1_700_000_000_000_000 + round_no] * n, pa.timestamp("us")),
        "html": pa.array(
            [f"<html><body>r{round_no}u{i}</body></html>".encode() for i in range(n)],
            pa.binary(),
        ),
        "lang": pa.array(["en"] * n, pa.string()),
    }
    if has_score:
        t = pa.int32() if width == "int32" else pa.int64()
        cols["score"] = pa.array([round_no * 100 + i for i in range(n)], t)
    if has_note:
        cols["note"] = pa.array([f"r{round_no}n{i}" for i in range(n)], pa.string())
    return pa.table(cols)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(rounds=round_strategy)
def test_random_evolution_orders_replay_exactly(
    rounds, ray_session, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("evo")
    n_urls = 6
    eng = CdcEngine(str(tmp / "lake"), EngineConfig(n_parts=2))
    lsn0 = 1
    for rno, spec in enumerate(rounds):
        b = _mk_batch(rno, n_urls, spec, lsn0)
        lsn0 += n_urls
        p = tmp / f"b{rno}.parquet"
        pq.write_table(b, p)
        eng.apply([str(p)])

    snap = eng.snapshot_table().to_pandas().sort_values("url").reset_index(drop=True)
    last = len(rounds) - 1
    has_score, has_note, _ = rounds[last]
    ever_score = any(s for s, _, _ in rounds)
    ever_note = any(nt for _, nt, _ in rounds)

    assert len(snap) == n_urls
    # every url's live row is the LAST round's event
    assert (
        snap["text"].str.contains(f"r{last}u").all()
    ), snap["text"].tolist()
    if ever_score:
        assert "score" in snap.columns
        if has_score:
            assert (
                snap["score"].to_numpy()
                == [last * 100 + i for i in range(n_urls)]
            ).all()
        else:
            assert snap["score"].isna().all()  # dropped ⇒ nulls, column kept
    else:
        assert "score" not in snap.columns
    if ever_note:
        assert "note" in snap.columns
        if has_note:
            assert list(snap["note"]) == [f"r{last}n{i}" for i in range(n_urls)]
        else:
            assert snap["note"].isna().all()
    else:
        assert "note" not in snap.columns

"""Property-based replay test (hypothesis): for RANDOM event streams —
arbitrary I/U/D mixes, random warc_ts ties, random contiguous round
groupings — the engine's final live state must equal the trivially-correct
oracle: per url, the last event by (warc_ts, lsn) wins; a winning delete
removes the url. This fuzzes the merge kernel, watermarking, carry-forward
and multi-round paths in one property."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from radiant_portal_pipeline_ray import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),  # url index
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=3),  # warc_ts bucket (ties!)
    ),
    min_size=1,
    max_size=60,
)


def _changelog_table(events):
    n = len(events)
    urls = [f"https://d{u % 3}.example.net/doc/{u:04d}" for u, _, _ in events]
    return pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "op": pa.array([op for _, op, _ in events], pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [1_700_000_000_000_000 + ts * 1_000_000 for _, _, ts in events],
                pa.timestamp("us"),
            ),
            "html": pa.array(
                [
                    None
                    if op == "D"
                    else f"<html><body>v{lsn}</body></html>".encode()
                    for lsn, (_, op, _) in enumerate(events, start=1)
                ],
                pa.binary(),
            ),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


def _oracle_live(events):
    rows = [
        {"url": f"https://d{u % 3}.example.net/doc/{u:04d}", "op": op,
         "warc_ts": ts, "lsn": i}
        for i, (u, op, ts) in enumerate(events, start=1)
    ]
    df = pd.DataFrame(rows).sort_values(["url", "warc_ts", "lsn"])
    winner = df.groupby("url", sort=True).tail(1)
    live = winner[winner["op"] != "D"][["url", "lsn"]]
    return live.sort_values("url").reset_index(drop=True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(events=events_strategy, n_rounds=st.integers(min_value=1, max_value=3))
def test_random_streams_match_lww_oracle(
    events, n_rounds, ray_session, tmp_path_factory
):
    tmp = tmp_path_factory.mktemp("lww")
    t = _changelog_table(events)
    # contiguous lsn ranges per round (the CDC monotone-log contract)
    n = t.num_rows
    cut = max(1, n // n_rounds)
    paths = []
    for r in range(n_rounds):
        chunk = t.slice(r * cut, cut if r < n_rounds - 1 else n - r * cut)
        if chunk.num_rows == 0:
            continue
        p = tmp / f"b{r}.parquet"
        pq.write_table(chunk, p)
        paths.append(str(p))
    eng = CdcEngine(str(tmp / "lake"), EngineConfig(n_parts=4))
    for p in paths:
        eng.apply([p])
    got = (
        eng.snapshot_table(columns=["url", "lsn"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = _oracle_live(events)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

"""Property-based fuzz of the window-function operators (hypothesis):
RANDOM tiny events/orders tables — engineered for heavy ties on the
window ORDER BY keys (duplicate timestamps → RANGE-frame peers, duplicate
prices → gaps-rank runs, group sizes straddling k for NTILE) — written to
a scratch sf_dir and run through the REAL distributed pipelines
(read → keyed exchange → vectorized kernel → sort) against the SAME
DuckDB oracle SQL the driver uses. This fuzzes exactly the paths the
fixed sf0.001 fixtures cannot: degenerate groups (n=1), all-tied runs,
windows longer than a key's whole history.
"""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from radiant_portal_pipeline_ray.pipelines import relational

# (user, half-hour bucket, value index) — tiny domains force ties
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=40,
)

# (customer, price index) — 3 price points force rank runs
orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=40,
)

_VALUES = [0.57, 12.25, 3.14]
_PRICES = [100.0, 2499.99, 100.0]  # two indices COLLIDE on price → ties
_BASE_US = 1_700_000_000_000_000


def _write_events(rows, d):
    n = len(rows)
    t = pa.table(
        {
            "event_id": pa.array(range(1, n + 1), pa.int64()),
            "ts": pa.array(
                [_BASE_US + b * 1_800_000_000 for _, b, _ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array(
                ["view" if v == 0 else "click" for _, _, v in rows], pa.string()
            ),
            "value": pa.array([_VALUES[v] for _, _, v in rows], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))


def _write_orders(rows, d):
    n = len(rows)
    t = pa.table(
        {
            "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
            "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
            "o_totalprice": pa.array([_PRICES[p] for _, p in rows], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(d, "orders.parquet"))


def _check(name, sf_dir, table, fname):
    fn, sql = relational.QUERIES[name]
    got = fn(sf_dir)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, fname)}')"
    )
    want = con.sql(sql).df()
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(by=sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    [
        "q_ntile_user_quartiles",
        "q_lead_next_event",
        "q_moving_sum3",
        "q_trailing_hour_sum",
        "q_running_total",
        "q_event_gaps",
    ],
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events_strategy)
def test_event_windows_fuzz(ray_session, tmp_path_factory, name, rows):
    d = str(tmp_path_factory.mktemp("fuzz_ev"))
    _write_events(rows, d)
    _check(name, d, "events", "events.parquet")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=orders_strategy)
def test_percent_rank_fuzz(ray_session, tmp_path_factory, rows):
    d = str(tmp_path_factory.mktemp("fuzz_ord"))
    _write_orders(rows, d)
    _check("q_price_percent_ranks", d, "orders", "orders.parquet")

"""The heavy-hitter superset guarantee must survive adversarial batching:
with tiny batches the per-batch pigeonhole bar (local_count*s > local_n)
is easy to clear, producing MANY candidates — but the exact recount must
still return exactly the true frequent set, in the oracle's order."""

import duckdb

from radiant_portal_pipeline_ray.pipelines.relational import (
    QUERIES,
    q_heavy_hitter_tokens,
)

SF = "/root/testdata/sf0.001"


def test_exact_under_small_s_and_batching(ray_session):
    # s=50 → higher frequency bar, different candidate geometry
    got = q_heavy_hitter_tokens(SF, s=50).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.sql(
        """
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ), tf AS (SELECT token FROM tok WHERE token <> '')
        SELECT token, COUNT(*) AS n FROM tf GROUP BY token
        HAVING COUNT(*) * 50 > (SELECT COUNT(*) FROM tf)
        ORDER BY n DESC, token
        """
    ).df()
    assert list(got["token"]) == list(want["token"])
    assert list(got["n"]) == list(want["n"])


def test_registered_sql_matches_default_s(ray_session):
    # guard: the registered oracle and the default s stay in sync (both 200)
    _, sql = QUERIES["q_heavy_hitter_tokens"]
    assert "* 200 >" in sql


def test_candidate_set_is_plasma_broadcast(ray_session, monkeypatch):
    """VERDICT r4 #5: the exact-recount stage must receive the candidate
    set via ONE ray.put broadcast (plasma, fetched per node), never by
    closure capture that re-ships the array inside every serialized task."""
    import pyarrow as pa
    import ray

    put_payloads = []
    orig_put = ray.put

    def spy(obj, **kw):
        put_payloads.append(obj)
        return orig_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy)
    got = q_heavy_hitter_tokens(SF, s=50)
    assert got.num_rows > 0
    broadcasts = [
        p
        for p in put_payloads
        if isinstance(p, (pa.ChunkedArray, pa.Array))
        and pa.types.is_string(p.type)
    ]
    assert len(broadcasts) == 1, "candidate set must be ray.put exactly once"

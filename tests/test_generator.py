import duckdb
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.functions.text import extract_text
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def _read_all(paths):
    import pyarrow as pa

    return pa.concat_tables([pq.read_table(p) for p in paths])


def test_deterministic(tmp_path):
    spec = ChangelogSpec(n_urls=100, n_events=400, n_batches=2, seed=7)
    p1 = generate_changelog(str(tmp_path / "a"), spec)
    p2 = generate_changelog(str(tmp_path / "b"), spec)
    assert _read_all(p1).equals(_read_all(p2))


def test_shape_and_invariants(tmp_path):
    spec = ChangelogSpec(n_urls=200, n_events=1000, n_batches=3, seed=42)
    paths = generate_changelog(str(tmp_path / "c"), spec)
    t = _read_all(paths)
    assert t.num_rows >= 1000  # logical + duplicate re-emissions
    ops = set(t.column("op").to_pylist())
    assert ops == {"I", "U", "D"}
    # D rows have null payloads; non-D rows have text == extract_text(html)
    con = duckdb.connect()
    con.register("t", t)
    assert (
        con.sql("select count(*) from t where op='D' and html is not null").fetchone()[0]
        == 0
    )
    nond = t.filter(__import__("pyarrow").compute.invert(
        __import__("pyarrow").compute.equal(t.column("op"), "D")
    ))
    recomputed = extract_text(nond.column("html"))
    assert recomputed.combine_chunks().to_pylist() == nond.column("text").to_pylist()
    # duplicates: same lsn appears more than once somewhere
    n_lsn = con.sql("select count(distinct lsn), count(*) from t").fetchone()
    assert n_lsn[1] > n_lsn[0]
    # out-of-order: warc_ts not monotone in lsn
    mono = con.sql(
        "select count(*) from (select lsn, warc_ts, lag(warc_ts) over (order by lsn) pw from t) where pw > warc_ts"
    ).fetchone()[0]
    assert mono > 0


def test_evolution_batches(tmp_path):
    spec = ChangelogSpec(
        n_urls=100, n_events=400, n_batches=4, seed=5, evolution=True
    )
    paths = generate_changelog(str(tmp_path / "e"), spec)
    schemas = [pq.read_schema(p) for p in paths]
    assert "status_code" not in schemas[0].names
    assert schemas[1].field("status_code").type == "int32"
    assert schemas[2].field("status_code").type == "int64"
    assert "lang" not in schemas[3].names

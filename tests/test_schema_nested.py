"""Nested-type schema evolution (round-2 "what's missing #3"): struct and
list columns must evolve (add/widen/drop subfields) through unify/align and
through a FULL multi-round CDC replay.

Reference analogue: struct evolution in
`radiant/tasks/vcf/snv/consequence.py:40-48` (exon struct) and
`radiant/tasks/iceberg/utils.py:38-43` (merge_schemas)."""

import duckdb
import pyarrow as pa
import pytest

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.schemas import (
    align_array,
    align_table,
    promote,
    unify_schemas,
)
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)

from tests.test_apply import DATA_COLS, assert_tables_equal, engine_state


# ---------------------------------------------------------------------------
def test_promote_nested():
    a = pa.struct([pa.field("x", pa.int32())])
    b = pa.struct([pa.field("x", pa.int64()), pa.field("y", pa.string())])
    assert promote(a, b) == b
    assert promote(b, a) == pa.struct(
        [pa.field("x", pa.int64()), pa.field("y", pa.string())]
    )
    assert promote(pa.list_(pa.float32()), pa.list_(pa.float64())) == pa.list_(
        pa.float64()
    )
    ls = pa.list_(pa.struct([pa.field("x", pa.int32())]))
    lw = pa.list_(
        pa.struct([pa.field("x", pa.int64()), pa.field("y", pa.string())])
    )
    assert promote(ls, lw) == lw
    with pytest.raises(TypeError):
        promote(pa.struct([pa.field("x", pa.int32())]), pa.list_(pa.int32()))


def test_unify_schemas_nested():
    s1 = pa.schema([pa.field("k", pa.int64()), pa.field("m", pa.struct([pa.field("a", pa.int32())]))])
    s2 = pa.schema(
        [
            pa.field("k", pa.int64()),
            pa.field(
                "m",
                pa.struct([pa.field("a", pa.int64()), pa.field("b", pa.string())]),
            ),
            pa.field("e", pa.list_(pa.float32())),
        ]
    )
    u = unify_schemas([s1, s2])
    assert u.field("m").type == pa.struct(
        [pa.field("a", pa.int64()), pa.field("b", pa.string())]
    )
    assert u.field("e").type == pa.list_(pa.float32())


def test_align_array_struct_add_and_widen():
    src = pa.array(
        [{"a": 1}, None, {"a": 3}],
        type=pa.struct([pa.field("a", pa.int32())]),
    )
    dst_t = pa.struct([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    out = align_array(src, dst_t)
    assert out.type == dst_t
    assert out.to_pylist() == [
        {"a": 1, "b": None},
        None,
        {"a": 3, "b": None},
    ]


def test_align_array_list_of_struct():
    src = pa.array(
        [[{"a": 1}, {"a": 2}], None, []],
        type=pa.list_(pa.struct([pa.field("a", pa.int32())])),
    )
    dst_t = pa.list_(
        pa.struct([pa.field("a", pa.int64()), pa.field("b", pa.string())])
    )
    out = align_array(src, dst_t)
    assert out.type == dst_t
    assert out.to_pylist() == [
        [{"a": 1, "b": None}, {"a": 2, "b": None}],
        None,
        [],
    ]


def test_align_table_nested_roundtrip():
    t = pa.table(
        {
            "k": pa.array([1, 2], type=pa.int64()),
            "m": pa.array(
                [{"a": 5}, {"a": 6}], type=pa.struct([pa.field("a", pa.int32())])
            ),
        }
    )
    target = pa.schema(
        [
            pa.field("k", pa.int64()),
            pa.field(
                "m",
                pa.struct([pa.field("a", pa.int64()), pa.field("b", pa.string())]),
            ),
            pa.field("e", pa.list_(pa.float32())),
        ]
    )
    out = align_table(t, target)
    assert out.schema == target
    assert out.column("e").null_count == 2


# ---------------------------------------------------------------------------
def _oracle_flat(paths, cols):
    """LWW oracle over the FLAT columns only (DuckDB cannot union structs of
    different width, so nested values are verified against the lsn-derived
    generation rule instead)."""
    con = duckdb.connect()
    sel = ", ".join(cols + ["op"])
    union = " UNION ALL ".join(
        f"SELECT {sel} FROM read_parquet('{p}')" for p in paths
    )
    q = f"""
      WITH dedup AS (SELECT DISTINCT * FROM ({union})),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
        FROM dedup)
      SELECT {', '.join(cols)} FROM ranked WHERE rn = 1 AND op <> 'D'
      ORDER BY url
    """
    return con.sql(q).arrow()


def test_nested_evolution_full_replay(ray_session, tmp_lake, tmp_path):
    """meta struct widens+gains a subfield and embedding list appears then
    drops across 4 changelog batches applied incrementally; the final
    snapshot must carry the unified nested schema with exact per-row values
    recomputed from the winning event's lsn."""
    import pyarrow.parquet as pq

    spec = ChangelogSpec(
        n_urls=300, n_events=2000, n_batches=4, seed=13, nested_evolution=True
    )
    paths = generate_changelog(str(tmp_path / "nevo"), spec)
    eng = CdcEngine(tmp_lake, EngineConfig(n_parts=8))
    for p in paths:  # batch-by-batch so the schema actually evolves
        eng.apply([p])

    snap = eng.snapshot_table()
    mt = snap.schema.field("meta").type
    assert mt.field("fetch_ms").type == pa.int64()  # widened int32→int64
    assert mt.field("crawler").type == pa.string()  # added subfield
    assert snap.schema.field("embedding").type == pa.list_(pa.float32())

    got = engine_state(eng, cols=DATA_COLS + ["meta", "embedding"])
    want = _oracle_flat(paths, DATA_COLS)
    assert_tables_equal(got.select(DATA_COLS), want)

    phase_of = {}
    for b, p in enumerate(paths):
        ph = (b * 4) // len(paths)
        for v in pq.read_table(p, columns=["lsn"]).column("lsn").to_pylist():
            phase_of[v] = ph
    for lsn, m, e in zip(
        got.column("lsn").to_pylist(),
        got.column("meta").to_pylist(),
        got.column("embedding").to_pylist(),
    ):
        ph = phase_of[lsn]
        if ph == 0:
            assert m is None and e is None
        else:
            assert m["fetch_ms"] == lsn % 1000
            assert m["crawler"] == (f"c{lsn % 3}" if ph >= 2 else None)
            if ph <= 2:
                assert e == [float(lsn % 7), float(lsn % 11)]
            else:
                assert e is None

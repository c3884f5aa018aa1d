"""Partitioned hash join for two LARGE sides (explicit bucketed shuffle).

When neither side fits a broadcast (reference J2's fallback:
"else co-partitioned map_groups merge", SURVEY §2.4), the portable Ray Data
shape is: add ``__bucket = stable_hash(key) % B`` to both sides, tag the
side, union, ``groupby(__bucket)``, and join the two sides of each bucket
with pyarrow's Acero ``Table.join`` inside ``map_groups``. One all-to-all
exchange; per-bucket work is a vectorized C++ hash join.

Skew note: a hot join key lands one bucket; raise ``num_buckets`` or
pre-salt hot keys (functions/hashing.assign_parts shows the persisted-salt
pattern). Bucket count B is the partitioning-assumption knob this operator
documents and relies on: each bucket's two sides must fit one worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Deterministic bucket id for int or string keys (vectorized)."""
    if pa.types.is_integer(col.type):
        v = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (v * _KNUTH) >> np.uint64(33)
        return pa.array((h % np.uint64(num_buckets)).astype(np.int32))
    from radiant_portal_pipeline_ray.functions.hashing import hash_strings_to_parts

    return hash_strings_to_parts(col, num_buckets)


def hash_partitioned_join(
    left: Dataset,
    right: Dataset,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_buckets: int = 16,
) -> Dataset:
    """Join two Datasets on a single key column. Column sets must be
    disjoint apart from the keys (standard relational hygiene)."""

    def tag(side: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            b = _bucket_of(batch.column(key), num_buckets)
            batch = batch.append_column(pa.field("__bucket", pa.int32()), b)
            return batch.append_column(
                pa.field("__side", pa.string()),
                pa.array([side] * batch.num_rows, type=pa.string()),
            )

        return fn

    lt = left.map_batches(tag("l", left_on), batch_format="pyarrow")
    rt = right.map_batches(tag("r", right_on), batch_format="pyarrow")

    l_names = [f.name for f in left.schema().base_schema]
    r_names = [f.name for f in right.schema().base_schema]

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        lmask = pc.equal(side, "l")
        lt_ = group.filter(lmask).select(l_names)
        rt_ = group.filter(pc.invert(lmask)).select(r_names)
        joined = lt_.join(
            rt_, keys=[left_on], right_keys=[right_on], join_type=how
        )
        return joined.combine_chunks()

    # union needs identical schemas → pad each side with the other's columns
    all_fields: dict[str, pa.DataType] = {}
    for sch in (left.schema().base_schema, right.schema().base_schema):
        for f in sch:
            all_fields.setdefault(f.name, f.type)
    union_schema = pa.schema(
        [pa.field(n, t) for n, t in all_fields.items()]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.string())]
    )
    from radiant_portal_pipeline_ray.schemas import align_table

    lt = lt.map_batches(lambda b: align_table(b, union_schema), batch_format="pyarrow")
    rt = rt.map_batches(lambda b: align_table(b, union_schema), batch_format="pyarrow")

    return lt.union(rt).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )

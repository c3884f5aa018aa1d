"""Task-based keyed exchange for the CDC merge (single-materialization shuffle).

Why a third exchange next to the Dataset sort path and the actor push path?
Measured on the bench replay (BASELINE.md): Ray Data's sort-based
``groupby(part).map_groups`` moves the full-width delta through plasma
three times (materialize → SortMap slices → SortReduce concat) plus a
boundary-sampling pass, and the page-fault cost of that traffic on a
shared VM *poisons every subsequent phase* (a post-sort read burns 10-20×
the CPU of the same read pre-sort — almost all kernel time). The actor
exchange avoids the sort but pays per-push serialization into long-lived
actor buffers and serializes merges behind ``num_cpus=0`` finalize
throttling.

This exchange is the minimal-copy shape:

  one raw Ray task per changelog chunk: read its row groups (pyarrow,
  worker-local, no object store) → transform (normalize / snapshot-cast)
  → split by ``part % n_buckets`` → return one Arrow sub-table PER BUCKET
  via static multi-returns (each its own plasma object, owned by the
  driver, reconstructable from task lineage on worker loss)

  one raw Ray task per bucket: zero-copy ``ray.get`` of its column of the
  ref matrix → concat → per-part slices → ``MergeKernel.merge_partition``

The delta is materialized into the object store exactly ONCE (the bucket
sub-tables); there is no sort, no boundary sampling, and no driver-side
row data. Grouping on a known small integer key domain is the one
primitive ``ray.data.Dataset`` can't express without a sort — same
justification as stages/exchange.py, with tasks instead of actors so every
intermediate lives in plasma (spillable, zero-copy reads) and merge
parallelism is scheduler-native.

Exactly-once: split tasks are deterministic pure functions of
(files, row groups, transform), so Ray lineage reconstruction after a lost
worker re-creates byte-identical sub-tables; the merge kernel is
deterministic (stages/merge.py); the round publishes nothing until the
manifest commit. Reference analogue: per-partition import runs are the
all-or-nothing retry unit (`radiant/dags/import_part.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from radiant_portal_pipeline_ray.stages.merge import MergeKernel


def enumerate_units(
    paths: list[str], metas: dict[str, object] | None = None
) -> list[tuple[str, int]]:
    """(path, row_group) work units — row-group granularity so a 2-file tail
    round still fans out across the cluster. ``metas`` may carry pre-read
    ``FileMetaData`` (the apply plan already does one threaded footer pass)."""
    units: list[tuple[str, int]] = []
    for p in paths:
        md = metas.get(p) if metas else None
        if md is None:
            md = pq.read_metadata(p)
        units.extend((p, rg) for rg in range(md.num_row_groups))
    return units


def chunk_units(
    units: list[tuple[str, int]], n_tasks: int
) -> list[list[tuple[str, int]]]:
    """Contiguous chunks (consecutive row groups of one file stay together →
    one ParquetFile open per file per task)."""
    n_tasks = max(1, min(n_tasks, len(units)))
    size = -(-len(units) // n_tasks)
    return [units[i : i + size] for i in range(0, len(units), size)]


def _lsn_col_index(md) -> int:
    for i in range(md.num_columns):
        if md.row_group(0).column(i).path_in_schema == "lsn":
            return i
    return -1


@ray.remote
def split_task(
    units: list[tuple[str, int]],
    transform,
    n_buckets: int,
    min_lsn: int | None,
):
    """Read assigned row groups → transform → split by bucket. Returns
    ``(stats, bucket_0, ..., bucket_{n-1})`` — launch with
    ``.options(num_returns=n_buckets + 1)``. Empty buckets return None.

    ``min_lsn`` enables row-group pruning on lsn max statistics (resume /
    replay-from-backlog rounds where most of the tail is pre-watermark);
    exact per-partition watermark filtering happens inside ``transform``.
    """
    by_file: dict[str, list[int]] = {}
    for p, rg in units:
        by_file.setdefault(p, []).append(rg)

    outs: list[pa.Table] = []
    for p, rgs in by_file.items():
        pf = pq.ParquetFile(p)
        md = pf.metadata
        if min_lsn is not None:
            ci = _lsn_col_index(md)
            if ci >= 0:
                kept = []
                for rg in rgs:
                    st = md.row_group(rg).column(ci).statistics
                    if (
                        st is not None
                        and st.has_min_max
                        and st.max is not None
                        and st.max <= min_lsn
                    ):
                        continue
                    kept.append(rg)
                rgs = kept
        for rg in rgs:
            t = transform(pf.read_row_group(rg))
            if t.num_rows:
                outs.append(t)

    if not outs:
        return tuple([{"events": 0, "parts": []}] + [None] * n_buckets)

    t = pa.concat_tables(outs, promote_options="permissive").combine_chunks()
    parts = t.column("part").to_numpy(zero_copy_only=False)
    bucket = parts % n_buckets
    # one bucket-sort copy, then zero-copy slices (a per-bucket filter()
    # would rescan the full table n_buckets times)
    order = np.argsort(bucket, kind="stable")
    t_sorted = t.take(pa.array(order)).combine_chunks()
    bs = bucket[order]
    bounds = np.searchsorted(bs, np.arange(n_buckets + 1))
    buckets: list[pa.Table | None] = []
    for b in range(n_buckets):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        buckets.append(t_sorted.slice(lo, hi - lo) if hi > lo else None)
    stats = {
        "events": t.num_rows,
        "parts": np.unique(parts).astype(int).tolist(),
    }
    return tuple([stats] + buckets)


@ray.remote
def merge_bucket_task(
    kernel: MergeKernel, refs: list, extra_parts: list[int]
) -> list[dict]:
    """Merge + stage every partition in one bucket. ``refs`` is this bucket's
    column of the split-output matrix (nested ObjectRefs — resolved here with
    a zero-copy ``ray.get``). ``extra_parts``: changed partitions owned by
    this bucket that shuffled no rows (e.g. local-carry-only partitions) —
    merged from an empty delta so their carried state still re-stages."""
    tables = [t for t in ray.get(list(refs)) if t is not None and t.num_rows]
    metas: list[dict] = []
    if tables:
        all_rows = pa.concat_tables(tables, promote_options="permissive")
        parts = all_rows.column("part").to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        sorted_t = all_rows.take(pa.array(order)).combine_chunks()
        sp = parts[order]
        bounds = np.flatnonzero(np.diff(sp)) + 1
        starts = np.concatenate([[0], bounds, [len(sp)]])
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            if lo == hi:
                continue
            part = int(sp[lo])
            metas.append(kernel.merge_partition(sorted_t.slice(lo, hi - lo), part))
    done = {m["part"] for m in metas}
    empty = None
    for p in extra_parts:
        if p in done:
            continue
        if empty is None:
            sch = kernel.union_schema
            empty = pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in sch], schema=sch
            )
        metas.append(kernel.merge_partition(empty, p))
    return metas

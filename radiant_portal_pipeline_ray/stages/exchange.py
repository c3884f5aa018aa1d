"""Streaming keyed exchange for the CDC merge (raw-actor shuffle).

Why not ``groupby(part).map_groups``? Ray Data's groupby is a sort-based
all-to-all: the normalized delta must be fully MATERIALIZED before the sort
samples range boundaries, so normalize and merge never overlap — at 8 CPUs
that barrier idles the cluster for a full merge phase per round (~25% of
round wall time), and a lazy input is worse (the sort re-executes the
expensive normalize for sampling; measured 2.3x slower end-to-end).

This module implements the one primitive the Dataset API can't express —
a streaming hash exchange on a KNOWN small key domain (partition ids) —
with raw Ray actors, per the "drop to raw actors only where Dataset can't
express the semantics" rule:

  normalize map task → split batch by ``part % n_shards`` → push sub-table
  to its shard actor (cheap buffer append) → merge runs in ``finalize()``
  per shard as soon as the consume pass ends. Event rows flow to the shard
  actors WHILE normalize is still running; there is no sort, no boundary
  sampling, and no materialized intermediate dataset.

Correctness under retries: pushes are at-least-once (a retried map task
re-pushes its rows). That is safe by construction — the LWW merge is
idempotent to duplicate event delivery (duplicate rows sort adjacently and
collapse to the same winner), the same property that makes the changelog's
at-least-once delivery safe. A lost SHARD actor aborts the whole apply
round; the round is transactional (nothing published until the manifest
commit), so the caller simply re-runs — same all-or-nothing unit as the
reference's per-partition import run.

Shard actors use ``num_cpus=0``: they must coexist with the normalize task
pool (a reserved CPU per shard would starve the map stage); buffer appends
are O(1), and the heavy ``finalize`` runs when the map stage has drained.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from radiant_portal_pipeline_ray.stages.merge import MergeKernel


@ray.remote(num_cpus=0)
class MergeShard:
    """Buffers pushed sub-tables, then merges + stages every partition it
    owns (``part % n_shards == shard_id``)."""

    def __init__(self, shard_id: int, n_shards: int):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.tables: list[pa.Table] = []

    def push(self, t: pa.Table) -> int:
        self.tables.append(t)
        return t.num_rows

    def finalize(self, kernel: MergeKernel, extra_parts: list[int]) -> list[dict]:
        """Merge every partition with buffered rows (plus ``extra_parts`` —
        changed partitions owned by this shard that received no shuffled
        rows, e.g. a migration target whose rows all carry locally).
        Returns one meta dict per partition."""
        metas: list[dict] = []
        if self.tables:
            all_rows = pa.concat_tables(self.tables, promote_options="permissive")
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
                metas.append(
                    kernel.merge_partition(sorted_t.slice(lo, hi - lo), part)
                )
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
        self.tables = []
        return metas


class ShardRouter:
    """map_batches stage: run the wrapped row transform, push its output to
    the shard actors, emit ONE tiny stats row per batch (events pushed +
    distinct parts seen) — the driver folds these into the changed-partition
    set, so no separate scout/unique pass is needed."""

    STATS_SCHEMA = pa.schema(
        [pa.field("events", pa.int64()), pa.field("parts", pa.list_(pa.int32()))]
    )

    def __init__(self, transform, shards: list, n_shards: int):
        self.transform = transform
        self.shards = shards
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.transform(batch)
        n = t.num_rows
        uniq = []
        if n:
            parts = t.column("part").to_numpy(zero_copy_only=False)
            shard = parts % self.n_shards
            # ONE shard-sort copy, then zero-copy slices per shard (a
            # per-shard filter() would rescan the full block n_shards times)
            order = np.argsort(shard, kind="stable")
            t_sorted = t.take(pa.array(order))
            ss = shard[order]
            bounds = np.searchsorted(ss, np.arange(self.n_shards + 1))
            refs = []
            for s in range(self.n_shards):
                lo, hi = int(bounds[s]), int(bounds[s + 1])
                if hi > lo:
                    refs.append(
                        self.shards[s].push.remote(t_sorted.slice(lo, hi - lo))
                    )
            # wait for delivery: guarantees every push is buffered before the
            # driver can possibly call finalize
            ray.get(refs)
            uniq = np.unique(parts).astype(np.int32).tolist()
        return pa.Table.from_pydict(
            {"events": [n], "parts": [uniq]}, schema=self.STATS_SCHEMA
        )


def build_exchange(ds, transform, shards: list, n_shards: int):
    """Lazy stats dataset: consuming it pushes every transformed row to its
    shard. ``batch_size=None`` = one push burst per BLOCK — the ack
    round-trip amortizes over ~30k rows instead of one per small batch."""
    router = ShardRouter(transform, shards, n_shards)
    return ds.map_batches(router, batch_format="pyarrow", batch_size=None)


def consume_stats(stats_ds) -> tuple[int, set[int]]:
    """Execute one or more unioned exchange stats datasets; returns
    (rows pushed, distinct partition ids seen)."""
    total = 0
    parts: set[int] = set()
    for row in stats_ds.take_all():
        total += int(row["events"])
        parts.update(int(p) for p in row["parts"])
    return total, parts


def run_exchange(ds, transform, shards: list, n_shards: int) -> tuple[int, set[int]]:
    return consume_stats(build_exchange(ds, transform, shards, n_shards))

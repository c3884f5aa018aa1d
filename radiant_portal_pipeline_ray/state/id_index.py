"""Per-partition hash-index actors: global key → dense-id dictionary state.

This is the engine's equivalent of the reference's ``variant_lookup``
AUTO_INCREMENT dictionary table populated insert-if-absent via
``LEFT ANTI JOIN`` (`radiant/dags/sql/radiant/init/variant_lookup_create_table.sql:1-7`,
`radiant/dags/sql/radiant/variant_lookup_insert_hashes.sql:1-6`): a shared
mutable index that the Dataset API genuinely cannot express, so it drops to
raw Ray actors — one actor per partition, ids allocated from disjoint
per-partition ranges (``part << shift | seq``) so there is NO cross-actor
coordination, ever.

Two ways to consume it:

- ``IdAssignStage`` — a callable class for
  ``map_batches(IdAssignStage(handles), batch_format="pyarrow")``: batches
  carry a ``part`` column; the stage groups rows by part and asks each
  partition's actor to assign/lookup ids for that slice. Actor handles are
  resolved once per worker (``__init__``-equivalent caching), matching the
  "stateful stages are actor pools" idiom.
- direct ``ray.get(actor.assign.remote(keys))`` from per-partition tasks
  (e.g. a ``map_groups`` merge task for its own partition).

At 10^10-key scale the per-partition dict is the memory bound — the
partition-count knob is the escape hatch (SURVEY §7.5); state can be
snapshotted/restored through the manifest for resume.

The default apply pipeline does NOT need these actors: its merge group
already co-locates a partition's old state and delta, so id assignment is a
deterministic local step (see stages/merge.py). The actor pool exists for
pipelines where the keyed state must OUTLIVE any single shuffle — cross-run
streaming dedup, dimension-table key assignment (reference `import-open-data`),
and membership tests without reloading the lake.
"""

from __future__ import annotations

import ray
import pyarrow as pa


@ray.remote(num_cpus=0.5)
class HashIndexActor:
    """Dictionary state for ONE partition: key(str) → id(int64)."""

    def __init__(self, part: int, shift: int = 40, start_seq: int = 0):
        self.part = part
        self.base = part << shift
        self.seq = start_seq
        self.index: dict[str, int] = {}

    def bootstrap(self, keys: list[str], ids: list[int]) -> int:
        self.index.update(zip(keys, ids))
        if ids:
            self.seq = max(self.seq, max(i - self.base for i in ids) + 1)
        return len(self.index)

    def assign(self, keys: list[str]) -> list[int]:
        """Insert-if-absent: existing keys keep their id, new keys get the
        next id in this partition's range. Deterministic given arrival order."""
        out = []
        idx = self.index
        for k in keys:
            i = idx.get(k)
            if i is None:
                i = self.base + self.seq
                self.seq += 1
                idx[k] = i
            out.append(i)
        return out

    def lookup(self, keys: list[str]) -> list[int | None]:
        return [self.index.get(k) for k in keys]

    def contains(self, keys: list[str]) -> list[bool]:
        return [k in self.index for k in keys]

    def snapshot(self) -> tuple[list[str], list[int], int]:
        return list(self.index.keys()), list(self.index.values()), self.seq

    def size(self) -> int:
        return len(self.index)


def create_index_pool(
    parts: list[int], shift: int = 40, start_seqs: dict[int, int] | None = None
) -> dict[int, "ray.actor.ActorHandle"]:
    start_seqs = start_seqs or {}
    return {
        p: HashIndexActor.remote(p, shift, start_seqs.get(p, 0)) for p in parts
    }


class IdAssignStage:
    """``map_batches`` callable: adds ``doc_id`` from the per-partition index
    actors. Rows are sliced by ``part`` and each slice round-trips one actor
    call — state is remote, batches stay Arrow end-to-end."""

    def __init__(self, handles: dict[int, "ray.actor.ActorHandle"], key_col: str):
        self.handles = handles
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        parts = batch.column("part").to_numpy(zero_copy_only=False)
        keys = batch.column(self.key_col).to_pylist()
        out = np.zeros(len(keys), dtype=np.int64)
        futures = {}
        for p in np.unique(parts):
            sel = np.flatnonzero(parts == p)
            futures[int(p)] = (
                sel,
                self.handles[int(p)].assign.remote([keys[i] for i in sel]),
            )
        for p, (sel, fut) in futures.items():
            out[sel] = ray.get(fut)
        col = pa.array(out, type=pa.int64())
        if "doc_id" in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index("doc_id"),
                pa.field("doc_id", pa.int64()),
                col,
            )
        return batch.append_column(pa.field("doc_id", pa.int64()), col)

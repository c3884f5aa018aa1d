"""Per-partition hash-index actors: global key → dense-id dictionary state.

This is the engine's equivalent of the reference's ``variant_lookup``
AUTO_INCREMENT dictionary table populated insert-if-absent via
``LEFT ANTI JOIN`` (`radiant/dags/sql/radiant/init/variant_lookup_create_table.sql:1-7`,
`radiant/dags/sql/radiant/variant_lookup_insert_hashes.sql:1-6`): a shared
mutable index that the Dataset API genuinely cannot express, so it drops to
raw Ray actors — one actor per partition, ids allocated from disjoint
per-partition ranges (``part << shift | seq``) so there is NO cross-actor
coordination, ever.

Hot-path design (no per-key Python anywhere):

- keys are identified by a 128-bit content hash — two independent 64-bit
  lanes computed vectorized (polars ``Series.hash`` over the Arrow buffer,
  no Python string objects are ever created). The birthday bound at 10^8
  keys/partition is ~10^-22; lane values are actor-internal ephemera
  (``snapshot()`` returns the ORIGINAL keys, and ``bootstrap`` re-hashes),
  so cross-process hash stability is not required.
- state is a list of frozen SHARDS: a pandas uint64 Index over lane-1
  (pandas caches the C hash-table engine, so probing N keys against a
  shard is one vectorized ``get_indexer`` — O(N) numeric, state size only
  paid at build), an aligned lane-2 array for verification, aligned ids,
  and the original keys as an Arrow array (snapshot only). Each ``assign``
  freezes its batch's new keys into one shard; shards merge when the list
  exceeds a small bound, so probe cost stays O(shards · N) and rebuilds
  amortize. Lane-1 collisions between distinct keys (expected ≪1 per
  partition) are handled by splitting duplicates into overflow shards —
  each shard's lane-1 values stay unique, probes verify lane-2.

Two ways to consume it:

- ``IdAssignStage`` — a callable class for
  ``map_batches(IdAssignStage(handles), batch_format="pyarrow")``: batches
  carry a ``part`` column; the stage groups rows by part and asks each
  partition's actor to assign/lookup ids for that slice, shipping Arrow
  key slices (never ``to_pylist``).
- direct ``ray.get(actor.assign.remote(keys))`` from per-partition tasks
  (e.g. a ``map_groups`` merge task for its own partition).

At 10^10-key scale the per-partition state is the memory bound — the
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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

#: merge all shards into one when the list grows past this — keeps probes
#: at a handful of C hashtable passes while amortizing rebuild cost.
_MAX_SHARDS = 8

_SEED_L1 = 0x51C3
_SEED_L2 = 0xA517


def _hash_lanes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized 64-bit hash lanes over an Arrow array."""
    import polars as pl

    s = pl.from_arrow(arr)
    return (
        s.hash(seed=_SEED_L1).to_numpy(),
        s.hash(seed=_SEED_L2).to_numpy(),
    )


def _as_arrow(keys) -> pa.Array:
    if isinstance(keys, pa.ChunkedArray):
        return keys.combine_chunks()
    if isinstance(keys, pa.Array):
        return keys
    return pa.array(keys)


def _dedupe_pairs_py(
    h1: np.ndarray, h2: np.ndarray, keep: str
) -> tuple[np.ndarray, np.ndarray]:
    """Exact tuple-dict fallback — only reached when two distinct keys in
    ONE batch collide on lane 1 (≈2^-44 per pair)."""
    pos: dict[tuple, int] = {}
    rep: list[int] = []
    inverse = np.empty(len(h1), dtype=np.int64)
    for i, pair in enumerate(zip(h1.tolist(), h2.tolist())):
        j = pos.get(pair)
        if j is None:
            j = pos[pair] = len(rep)
            rep.append(i)
        elif keep == "last":
            rep[j] = i
        inverse[i] = j
    return np.asarray(rep, dtype=np.int64), inverse


def _dedupe_pairs(
    h1: np.ndarray, h2: np.ndarray, keep: str
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (h1, h2)-pair dedupe.

    Returns (rep_idx, inverse): ``rep_idx`` indexes the kept representative
    of each distinct pair in FIRST-APPEARANCE order of the pair (id
    determinism), picking the first (``keep='first'``) or last
    (``keep='last'`` — dict.update overwrite semantics) occurrence as the
    representative; ``inverse[i]`` is the position of row i's pair in
    ``rep_idx``.

    Fast path groups on lane 1 alone via ``pd.factorize`` (O(n) C
    hashtable, uniques in first-appearance order) and verifies lane 2
    against each group's representative — rows that disagree mean a
    within-batch lane-1 collision between distinct keys, which drops to the
    exact tuple-dict path."""
    n = len(h1)
    codes, _uniq = pd.factorize(h1)
    k = len(_uniq)
    first = np.empty(k, dtype=np.int64)
    # reversed write: the LAST store for each code comes from the SMALLEST
    # row index, so `first[c]` = first occurrence of group c
    first[codes[::-1]] = np.arange(n - 1, -1, -1, dtype=np.int64)
    if not np.array_equal(h2, h2[first[codes]]):
        return _dedupe_pairs_py(h1, h2, keep)
    if keep == "first":
        rep = first
    else:
        rep = np.empty(k, dtype=np.int64)
        rep[codes] = np.arange(n, dtype=np.int64)  # last write wins
    return rep, codes.astype(np.int64, copy=False)


class _ShardedIndex:
    """key → id with vectorized insert-if-absent (see module docstring).

    Plain class (not an actor) so merge paths / tests can use it locally;
    ``HashIndexActor`` wraps it remotely."""

    def __init__(self, base: int, start_seq: int = 0):
        self.base = base
        self.seq = start_seq
        self._idx: list[pd.Index] = []  # uint64 lane-1, unique per shard
        self._h2: list[np.ndarray] = []
        self._ids: list[np.ndarray] = []
        self._keys: list[pa.Array] = []  # originals, for snapshot()

    # -- probing ---------------------------------------------------------
    def _probe_hashed(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.full(len(h1), -1, dtype=np.int64)
        missing = np.arange(len(h1))
        for idx, sh2, ids in zip(self._idx, self._h2, self._ids):
            if missing.size == 0:
                break
            pos = idx.get_indexer(h1[missing])
            hit = pos >= 0
            ok = hit.copy()
            ok[hit] = sh2[pos[hit]] == h2[missing[hit]]
            out[missing[ok]] = ids[pos[ok]]
            # lane-1 hit with lane-2 mismatch = different key in an overflow
            # shard — keep probing later shards
            missing = missing[~ok]
        return out

    def probe(self, keys) -> np.ndarray:
        arr = _as_arrow(keys)
        if len(arr) == 0:
            return np.empty(0, dtype=np.int64)
        return self._probe_hashed(*_hash_lanes(arr))

    # -- shard maintenance ----------------------------------------------
    def _freeze(
        self,
        h1: np.ndarray,
        h2: np.ndarray,
        ids: np.ndarray,
        keys: pa.Array,
    ) -> None:
        """Append shards from distinct-pair arrays, splitting duplicate
        lane-1 values into overflow shards so each pd.Index stays unique."""
        while len(h1):
            first = ~pd.Series(h1).duplicated(keep="first").to_numpy()
            self._idx.append(pd.Index(h1[first]))
            self._h2.append(h2[first])
            self._ids.append(ids[first])
            self._keys.append(keys.take(pa.array(np.flatnonzero(first))))
            rest = ~first
            if not rest.any():
                return
            h1, h2, ids = h1[rest], h2[rest], ids[rest]
            keys = keys.take(pa.array(np.flatnonzero(rest)))

    def _maybe_merge(self) -> None:
        if len(self._idx) <= _MAX_SHARDS:
            return
        h1 = np.concatenate([i.to_numpy() for i in self._idx])
        h2 = np.concatenate(self._h2)
        ids = np.concatenate(self._ids)
        keys = pa.concat_arrays(
            [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
             for k in self._keys]
        )
        self._idx, self._h2, self._ids, self._keys = [], [], [], []
        # shards were pair-disjoint, so no pair dedupe is needed — only the
        # lane-1 uniqueness split
        self._freeze(h1, h2, ids, keys)

    # -- public ops ------------------------------------------------------
    def assign(self, keys) -> np.ndarray:
        arr = _as_arrow(keys)
        if len(arr) == 0:
            return np.empty(0, dtype=np.int64)
        h1, h2 = _hash_lanes(arr)
        out = self._probe_hashed(h1, h2)
        miss = out < 0
        if miss.any():
            mi = np.flatnonzero(miss)
            rep, inverse = _dedupe_pairs(h1[mi], h2[mi], keep="first")
            u_ids = self.base + self.seq + np.arange(
                len(rep), dtype=np.int64
            )
            self.seq += len(rep)
            out[mi] = u_ids[inverse]
            self._freeze(
                h1[mi][rep], h2[mi][rep], u_ids, arr.take(pa.array(mi[rep]))
            )
            self._maybe_merge()
        return out

    def bootstrap(self, keys, ids) -> int:
        """dict.update semantics: later pairs overwrite earlier ones."""
        arr = _as_arrow(keys)
        new_ids = np.asarray(ids, dtype=np.int64)
        if len(self._idx):
            bh1 = np.concatenate([i.to_numpy() for i in self._idx])
            bh2 = np.concatenate(self._h2)
            bids = np.concatenate(self._ids)
            bkeys = pa.concat_arrays(
                [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
                 for k in self._keys]
            )
            nh1, nh2 = _hash_lanes(arr) if len(arr) else (
                np.empty(0, np.uint64), np.empty(0, np.uint64))
            h1 = np.concatenate([bh1, nh1])
            h2 = np.concatenate([bh2, nh2])
            allids = np.concatenate([bids, new_ids])
            allkeys = pa.concat_arrays([bkeys, arr])
        else:
            if len(arr) == 0:
                return 0
            h1, h2 = _hash_lanes(arr)
            allids, allkeys = new_ids, arr
        rep, _ = _dedupe_pairs(h1, h2, keep="last")
        self._idx, self._h2, self._ids, self._keys = [], [], [], []
        self._freeze(
            h1[rep], h2[rep], allids[rep], allkeys.take(pa.array(rep))
        )
        if len(allids):
            self.seq = max(self.seq, int((allids - self.base).max()) + 1)
        return self.size()

    def size(self) -> int:
        return sum(len(i) for i in self._idx)

    def snapshot(self) -> tuple[list[str], list[int], int]:
        k = [x for ks in self._keys for x in ks.to_pylist()]
        v = [int(x) for ids in self._ids for x in ids]
        return k, v, self.seq


@ray.remote(num_cpus=0.5)
class HashIndexActor:
    """Dictionary state for ONE partition: key(str) → id(int64)."""

    def __init__(self, part: int, shift: int = 40, start_seq: int = 0):
        self.part = part
        self._idx = _ShardedIndex(part << shift, start_seq)

    def bootstrap(self, keys, ids) -> int:
        return self._idx.bootstrap(keys, ids)

    def assign(self, keys) -> list[int]:
        """Insert-if-absent: existing keys keep their id, new keys get the
        next id in this partition's range. Deterministic given arrival order."""
        return self._idx.assign(keys).tolist()

    def lookup(self, keys) -> list[int | None]:
        out = self._idx.probe(keys).astype(object)
        out[out == -1] = None
        return out.tolist()

    def contains(self, keys) -> list[bool]:
        return (self._idx.probe(keys) >= 0).tolist()

    def snapshot(self) -> tuple[list[str], list[int], int]:
        return self._idx.snapshot()

    def size(self) -> int:
        return self._idx.size()


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
    call — state is remote, batches stay Arrow end-to-end (key slices ship
    as Arrow arrays, never ``to_pylist``)."""

    def __init__(self, handles: dict[int, "ray.actor.ActorHandle"], key_col: str):
        self.handles = handles
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        keys = _as_arrow(batch.column(self.key_col))
        out = np.zeros(len(keys), dtype=np.int64)
        futures = {}
        for p in np.unique(parts):
            sel = np.flatnonzero(parts == p)
            futures[int(p)] = (
                sel,
                self.handles[int(p)].assign.remote(keys.take(pa.array(sel))),
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

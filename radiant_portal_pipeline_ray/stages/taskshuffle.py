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

Partitioning assumptions (the knobs this operator relies on):
- every row of a key lands in exactly one bucket (``hash(key) % B``), so
  any per-key kernel decomposes exactly over buckets;
- ONE bucket's rows (both sides, for joins) must fit a worker's heap —
  ``n_buckets`` / the 64 MB-per-bucket sizing is the skew knob; salt hot
  keys upstream (state/partitioner.py) when a single key exceeds it;
- driver metadata is O(tasks × buckets) ObjectRefs at level one. When
  (tasks × buckets) exceeds ``_REF_BUDGET`` the exchange automatically
  adds a SECOND level: level-1 tasks split into G groups (G | B, so the
  modulo hashes agree), one ``subsplit_task`` per group re-splits its
  group's sub-tables into the B/G final buckets. Driver refs drop from
  T×B to T×G + B (G ≈ √B, floored by a per-group heap bound) at the cost
  of one extra plasma copy of the exchanged bytes. Block-count-based
  chunking assumes roughly equal-sized input blocks (true for
  row-group-granular reads).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from radiant_portal_pipeline_ray.stages.merge import MergeKernel


def enumerate_units(
    paths: list[str],
    metas: dict[str, object] | None = None,
    filesystem=None,
) -> list[tuple[str, int]]:
    """(path, row_group) work units — row-group granularity so a 2-file tail
    round still fans out across the cluster. ``metas`` may carry pre-read
    ``FileMetaData`` (the apply plan already does one threaded footer pass).
    ``filesystem``: fsspec fs for object-store lake files (None = local)."""
    units: list[tuple[str, int]] = []
    for p in paths:
        md = metas.get(p) if metas else None
        if md is None:
            md = pq.read_metadata(p, filesystem=filesystem)
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
    filesystem=None,
    exclude_cols: tuple = (),
    fault_inject: tuple | None = None,
):
    """Read assigned row groups → transform → split by bucket. Returns
    ``(stats, bucket_0, ..., bucket_{n-1})`` — launch with
    ``.options(num_returns=n_buckets + 1)``. Empty buckets return None.

    ``fault_inject`` (tests only): ``("scout", dir)`` makes the first such
    task hard-kill its worker once — see ``chaos.maybe_die_once``.

    ``min_lsn`` enables row-group pruning on lsn max statistics (resume /
    replay-from-backlog rounds where most of the tail is pre-watermark);
    exact per-partition watermark filtering happens inside ``transform``.

    ``exclude_cols`` prunes columns at the parquet decode: the normalizer
    path passes ``("text",)`` because the committed snapshot NEVER trusts
    incoming text (it recomputes ``extract_text(html)``) — the changelog's
    text column is ~40% of its bytes, all wasted decode (measured 1.3×
    scout speedup at 2M events). The caster path passes nothing: carried
    snapshot rows keep their committed text verbatim.
    """
    from radiant_portal_pipeline_ray.chaos import maybe_die_once

    maybe_die_once(fault_inject, "scout")
    by_file: dict[str, list[int]] = {}
    for p, rg in units:
        by_file.setdefault(p, []).append(rg)

    # bucket per ROW GROUP, concat per bucket at the end: peak heap is one
    # row group's working copies plus the (inevitable) accumulated output —
    # never a whole-chunk concat+argsort (3-4x chunk bytes on a fat chunk,
    # e.g. the 2-CPU leg where one task owns 16 files)
    per_bucket: list[list[pa.Table]] = [[] for _ in range(n_buckets)]
    events = 0
    parts_seen: set[int] = set()
    #: malformed events split off by the normalizer (quarantine mode): the
    #: rows ride back in the stats object — pathological by definition, so
    #: capped per task; overflow is counted, never silently lost
    q_tables: list[pa.Table] = []
    q_rows = 0
    q_dropped = 0
    _Q_CAP = 100_000
    for p, rgs in by_file.items():
        pf = (
            pq.ParquetFile(filesystem.open(p, "rb"))
            if filesystem is not None
            else pq.ParquetFile(p)
        )
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
        read_cols = None
        if exclude_cols:
            read_cols = [
                c for c in pf.schema_arrow.names if c not in exclude_cols
            ]
        for rg in rgs:
            t = transform(
                pf.read_row_group(rg, columns=read_cols)
                if read_cols is not None
                else pf.read_row_group(rg)
            )
            if isinstance(t, tuple):
                t, qt = t
                if qt is not None and qt.num_rows:
                    take = min(qt.num_rows, _Q_CAP - q_rows)
                    if take > 0:
                        q_tables.append(qt.slice(0, take))
                        q_rows += take
                    q_dropped += qt.num_rows - take
            if not t.num_rows:
                continue
            events += t.num_rows
            parts = t.column("part").to_numpy(zero_copy_only=False)
            bucket = parts % n_buckets
            order = np.argsort(bucket, kind="stable")
            ts = t.take(pa.array(order))
            bs = bucket[order]
            bounds = np.searchsorted(bs, np.arange(n_buckets + 1))
            for b in range(n_buckets):
                lo, hi = int(bounds[b]), int(bounds[b + 1])
                if hi > lo:
                    per_bucket[b].append(ts.slice(lo, hi - lo))
            parts_seen.update(np.unique(parts).astype(int).tolist())

    quarantine = (
        pa.concat_tables(q_tables, promote_options="permissive").combine_chunks()
        if q_tables
        else None
    )
    if not events:
        stats = {"events": 0, "parts": []}
        if quarantine is not None:
            stats["quarantine"] = quarantine
            stats["quarantine_dropped"] = q_dropped
        return tuple([stats] + [None] * n_buckets)
    buckets: list[pa.Table | None] = [
        pa.concat_tables(bl, promote_options="permissive").combine_chunks()
        if bl
        else None
        for bl in per_bucket
    ]
    stats = {"events": events, "parts": sorted(parts_seen)}
    if quarantine is not None:
        stats["quarantine"] = quarantine
        stats["quarantine_dropped"] = q_dropped
    return tuple([stats] + buckets)


# ---------------------------------------------------------------------------
# Generic keyed exchange over Dataset blocks (shared by the relational
# operators): same single-materialization shape as the CDC split/merge above,
# parameterized by key columns and a per-bucket kernel. Replaces
# ``groupby(bucket).map_groups`` (Ray Data's sort-based all-to-all) for
# operators that only need hash co-location, not a global order.
# ---------------------------------------------------------------------------

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def bucket_ids(batch: pa.Table, keys: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic composite-key bucket id (vectorized)."""
    import pyarrow.compute as pc

    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch.column(k)
        if pa.types.is_integer(col.type):
            v = (
                pc.fill_null(pc.cast(col, pa.int64()), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
        else:
            from radiant_portal_pipeline_ray.stages.dedup import hash64_strings

            v = hash64_strings(pc.cast(col, pa.string())).astype(np.uint64)
        h = (h ^ v) * _KNUTH
    return ((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)


@ray.remote
def bucket_split_task(refs: list, keys: list[str], n_buckets: int):
    """Concat a chunk of Dataset blocks → split by key-hash bucket. Returns
    one sub-table (or None) per bucket via static multi-returns."""
    tabs = [t for t in ray.get(list(refs)) if t.num_rows]
    if not tabs:
        return tuple([None] * n_buckets) if n_buckets > 1 else None
    t = pa.concat_tables(tabs, promote_options="permissive").combine_chunks()
    b = bucket_ids(t, keys, n_buckets)
    order = np.argsort(b, kind="stable")
    ts = t.take(pa.array(order)).combine_chunks()
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(n_buckets + 1))
    out = [
        ts.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        if bounds[i + 1] > bounds[i]
        else None
        for i in range(n_buckets)
    ]
    return tuple(out) if n_buckets > 1 else out[0]


def _concat_or_empty(tabs: list, schema: pa.Schema) -> pa.Table:
    tabs = [t for t in tabs if t is not None and t.num_rows]
    if not tabs:
        return pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema
        )
    return pa.concat_tables(tabs, promote_options="permissive").combine_chunks()


@ray.remote
def bucket_apply_task(fn, refs: list, schema: pa.Schema) -> pa.Table:
    """Unary per-bucket kernel over one bucket's ref column."""
    return fn(_concat_or_empty(ray.get(list(refs)), schema))


@ray.remote
def bucket_join_task(
    fn, l_refs: list, r_refs: list, l_schema: pa.Schema, r_schema: pa.Schema
) -> pa.Table:
    """Binary per-bucket kernel (join) over aligned bucket columns."""
    lt = _concat_or_empty(ray.get(list(l_refs)), l_schema)
    rt = _concat_or_empty(ray.get(list(r_refs)), r_schema)
    return fn(lt, rt)


#: target bytes per bucket/split-task — sized so the (tasks × buckets)
#: object count stays small for small inputs (a 40 MB partial table gets 4
#: buckets, not 64×64 = 4096 tiny plasma objects) while large inputs fan out
#: to the caller's ceiling.
_TARGET_BUCKET_BYTES = 64 << 20

#: below this, run the group kernel once on the driver (pre-combined
#: partials / pruned rows only — still a single vectorized arrow call)
_DRIVER_LOCAL_BYTES = 16 << 20

#: driver ObjectRef budget per exchange: above this the split runs in two
#: levels (split → per-group subsplit). Env-overridable; tests monkeypatch
#: the module attribute to force the two-level path at toy scale.
_REF_BUDGET = int(os.environ.get("GRAFT_EXCHANGE_REF_BUDGET", "32768"))

#: a level-2 subsplit task holds one whole GROUP (B/G buckets) in heap;
#: groups are sized so that never exceeds this many bytes.
_MAX_GROUP_BYTES = 1 << 30

#: introspection for tests/benchmarks: plan of the most recent split
#: ({"levels": 1|2, "n_tasks": T, "n_buckets": B, "n_groups": G,
#:   "driver_refs": peak refs held}).
last_split_plan: dict = {}


def two_level_plan(
    n_tasks: int, n_buckets: int, total_bytes: int
) -> tuple[int, int] | None:
    """Decide whether a (n_tasks × n_buckets) exchange needs a second split
    level; returns ``(n_groups, adjusted_n_buckets)`` (G | B) or None for
    single-level. G is ~√B, floored so one group's bytes fit a worker."""
    if n_tasks * n_buckets <= _REF_BUDGET or n_buckets < 4:
        return None
    g_mem = -(-total_bytes // _MAX_GROUP_BYTES)
    g_sqrt = int(np.ceil(np.sqrt(n_buckets)))
    want = max(1, min(max(g_mem, g_sqrt), n_buckets))
    # power-of-two group count: divides any power-of-two bucket count, so
    # the two sides of an exchange_join can pick different G for the SAME
    # final B (final bucket = hash % B on both sides either way)
    n_groups = 1 << (want - 1).bit_length()
    n_groups = min(n_groups, n_buckets)
    n_buckets = -(-n_buckets // n_groups) * n_groups
    return n_groups, n_buckets


@ray.remote
def subsplit_task(refs: list, keys: list[str] | None, n_buckets: int, n_groups: int):
    """Second exchange level: one GROUP's level-1 sub-tables → that group's
    final buckets. Level 1 grouped rows by ``hash % G``; because G | B and
    both levels share the hash, every row here satisfies ``bucket % G ==
    g`` and the local index is ``bucket // G``. ``keys=None`` selects the
    CDC part-modulo bucketing (``bucket = part % B``)."""
    n_local = n_buckets // n_groups
    tabs = [t for t in ray.get(list(refs)) if t is not None and t.num_rows]
    if not tabs:
        return tuple([None] * n_local) if n_local > 1 else None
    t = pa.concat_tables(tabs, promote_options="permissive").combine_chunks()
    if keys is None:
        parts = t.column("part").to_numpy(zero_copy_only=False)
        local = ((parts % n_buckets) // n_groups).astype(np.int64)
    else:
        local = bucket_ids(t, keys, n_buckets) // n_groups
    order = np.argsort(local, kind="stable")
    ts = t.take(pa.array(order)).combine_chunks()
    ls = local[order]
    bounds = np.searchsorted(ls, np.arange(n_local + 1))
    out = [
        ts.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        if bounds[i + 1] > bounds[i]
        else None
        for i in range(n_local)
    ]
    return tuple(out) if n_local > 1 else out[0]


def fan_subsplit(
    mat: list[list], keys: list[str] | None, n_buckets: int, n_groups: int
) -> list[list]:
    """Fan a (task × group) level-1 ref matrix through one subsplit task per
    group; returns per-final-bucket ref columns (bucket b = g + G·j lives at
    group g = b % G, local slot j = b // G)."""
    n_local = n_buckets // n_groups
    sub = subsplit_task.options(num_returns=n_local) if n_local > 1 else subsplit_task
    cols: list[list] = [[] for _ in range(n_buckets)]
    for g in range(n_groups):
        outs = sub.remote([row[g] for row in mat], keys, n_buckets, n_groups)
        outs = [outs] if n_local == 1 else list(outs)
        for j, r in enumerate(outs):
            cols[g + n_groups * j] = [r]
    return cols


def _split_refs(
    refs: list, keys: list[str], n_buckets: int, total_bytes: int
) -> tuple[list[list], int]:
    """Fan a Dataset's block refs through the (possibly two-level) split;
    returns ``(per-bucket ref columns, adjusted n_buckets)``. Empty input →
    empty columns (downstream kernels see typed empty tables)."""
    global last_split_plan
    if not refs:
        last_split_plan = {"levels": 0, "n_tasks": 0, "n_buckets": n_buckets,
                           "n_groups": 0, "driver_refs": 0}
        return [[] for _ in range(n_buckets)], n_buckets
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    by_size = max(1, -(-total_bytes // (_TARGET_BUCKET_BYTES // 4)))
    n_tasks = max(1, min(2 * cpus, len(refs), by_size))
    size = -(-len(refs) // n_tasks)
    chunks = [refs[i : i + size] for i in range(0, len(refs), size)]
    plan = two_level_plan(len(chunks), n_buckets, total_bytes)
    if plan is not None:
        n_groups, n_buckets = plan
        task = bucket_split_task.options(num_returns=n_groups) if n_groups > 1 else bucket_split_task
        mat = [task.remote(ch, keys, n_groups) for ch in chunks]
        if n_groups == 1:
            mat = [[r] for r in mat]
        else:
            mat = [list(r) for r in mat]
        cols = fan_subsplit(mat, keys, n_buckets, n_groups)
        last_split_plan = {
            "levels": 2, "n_tasks": len(chunks), "n_buckets": n_buckets,
            "n_groups": n_groups,
            "driver_refs": len(chunks) * n_groups + n_buckets,
        }
        return cols, n_buckets
    task = bucket_split_task.options(num_returns=n_buckets) if n_buckets > 1 else bucket_split_task
    mat = [task.remote(ch, keys, n_buckets) for ch in chunks]
    if n_buckets == 1:
        mat = [[r] for r in mat]
    else:
        mat = [list(r) for r in mat]
    last_split_plan = {
        "levels": 1, "n_tasks": len(chunks), "n_buckets": n_buckets,
        "n_groups": 0, "driver_refs": len(chunks) * n_buckets,
    }
    return [[row[b] for row in mat] for b in range(n_buckets)], n_buckets


def _clamp_buckets(n_buckets: int, total_bytes: int) -> int:
    """Small inputs don't amortize per-bucket task overhead — scale the
    bucket count with the exchanged byte volume (the caller's ``n_buckets``
    stays the ceiling: the partitioning-assumption knob at real scale).
    Rounded down to a power of two so two-level group counts divide it and
    the two sides of a join agree on the final B."""
    by_size = max(4, -(-total_bytes // _TARGET_BUCKET_BYTES))
    v = max(1, min(n_buckets, by_size))
    return 1 << (v.bit_length() - 1)


def exchange_group(ds, keys: list[str], n_buckets: int, fn):
    """Hash-partition ``ds`` on ``keys`` into ``n_buckets`` and apply
    ``fn(bucket_table) -> pa.Table`` once per bucket (every row of a key in
    exactly one call). Returns a Dataset of the concatenated results. One
    plasma materialization, no sort."""
    import ray.data as rd

    sch = ds.schema(fetch_if_missing=True)
    if sch is None:
        # zero-block input: grouping is a no-op (matches groupby().map_groups
        # on an empty dataset — the kernel is never invoked)
        return ds
    schema = pa.schema(sch.base_schema)
    ds = ds.materialize()
    refs = ds.to_arrow_refs()
    nbytes = int(ds.size_bytes() or 0)
    if nbytes <= _DRIVER_LOCAL_BYTES:
        # tiny exchange (pre-combined partials, pruned top-k rows): one
        # vectorized kernel call beats any task fan-out. Bounded by the
        # byte threshold — never the raw-input path.
        import ray as _ray

        t = _concat_or_empty(_ray.get(refs), schema)
        return rd.from_arrow(fn(t))
    n_buckets = _clamp_buckets(n_buckets, nbytes)
    cols, n_buckets = _split_refs(refs, keys, n_buckets, nbytes)
    out = [
        bucket_apply_task.remote(fn, cols[b], schema) for b in range(n_buckets)
    ]
    return rd.from_arrow_refs(out)


def exchange_join(
    left,
    right,
    left_keys: list[str],
    right_keys: list[str],
    n_buckets: int,
    fn,
):
    """Hash-co-partition two Datasets and apply ``fn(left_bucket,
    right_bucket) -> pa.Table`` per aligned bucket pair. The two sides
    exchange independently (no union / column padding); empty sides arrive
    as empty tables with the correct schema so outer joins stay exact."""
    import ray.data as rd

    l_sch = left.schema(fetch_if_missing=True)
    r_sch = right.schema(fetch_if_missing=True)
    if l_sch is None or r_sch is None:
        # a zero-BLOCK side (e.g. from_arrow_refs([])) carries no schema, so
        # a typed empty bucket table can't be synthesized for the kernel;
        # fail with the contract instead of AttributeError on .base_schema
        side = "left" if l_sch is None else "right"
        raise ValueError(
            f"exchange_join: {side} side has zero blocks and no schema; "
            "pass a dataset with at least one (possibly empty) typed block"
        )
    l_schema = pa.schema(l_sch.base_schema)
    r_schema = pa.schema(r_sch.base_schema)
    left, right = left.materialize(), right.materialize()
    l_refs = left.to_arrow_refs()
    r_refs = right.to_arrow_refs()
    l_bytes = int(left.size_bytes() or 0)
    r_bytes = int(right.size_bytes() or 0)
    n_buckets = _clamp_buckets(n_buckets, max(l_bytes, r_bytes))
    l_cols, nb_l = _split_refs(l_refs, left_keys, n_buckets, l_bytes)
    r_cols, nb_r = _split_refs(r_refs, right_keys, n_buckets, r_bytes)
    assert nb_l == nb_r == n_buckets  # pow2 B is invariant under two-level G
    out = [
        bucket_join_task.remote(fn, l_cols[b], r_cols[b], l_schema, r_schema)
        for b in range(n_buckets)
    ]
    return rd.from_arrow_refs(out)


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

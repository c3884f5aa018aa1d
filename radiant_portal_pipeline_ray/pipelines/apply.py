"""The CDC apply loop — changelog tail → partitioned LWW upsert → COW commit.

One ``CdcEngine.apply(changelog)`` call is one incremental ingest round
(reference analogue: one `import-part` DAG run,
`radiant/dags/import_part.py:100-625`, plus the `import_radiant` control
loop `radiant/dags/import_radiant.py:48-210`):

  1. read the committed manifest (watermarks, salt map, schema, counters)
  2. changed partitions are discovered BY the merge itself (a group only
     forms where rows exist; the carried-file map is offered for every
     committed partition as metadata) — no separate scout/unique pass over
     the delta; ``cfg.sparse_scout`` instead probes a column-pruned
     (url+lsn) read when the tail is mostly pre-watermark (salting
     decisions come from the merge's heavy-hitter counts, applied NEXT
     round)
  3. schema discovery over changelog footers → widen-only unification with
     the snapshot schema (add / widen / drop evolution)
  4. the delta exchange (default ``cfg.exchange='task'``,
     stages/taskshuffle.py): fused read+normalize+split tasks — one per
     row-group chunk, with lsn row-group pruning — emit one plasma object
     per partition bucket; the delta is materialized exactly once, with no
     sort and no boundary sampling. (``'sort'`` keeps the Dataset
     ``groupby(part).map_groups`` path: read → normalize ``map_batches`` →
     materialize → sort shuffle; ``'actor'`` streams pushes into shard
     actors — see stages/exchange.py.)
  5. carried-forward side: a STABLE changed partition's committed files are
     read locally INSIDE its merge task (the lake layout is already
     part-partitioned) — only partitions under a salt migration, whose
     routing is changing, shuffle their carried rows through the snapshot
     caster (``op='S'``)
  6. per-bucket merge tasks run the vectorized LWW merge kernel
     (stages/merge.py), each partition writing url-sorted staged Parquet
     and returning one metadata row
  7. two-phase commit: promote staged files, publish manifest v+1 via
     atomic put-if-absent (idempotent by txn-id, conflict-retry loop;
     fails fast if a concurrent writer advanced a merged partition)

Only tiny metadata ever reaches the driver; data flows Arrow-zero-copy
through Ray's streaming executor with ONE keyed exchange carrying the
delta — at steady state the change stream, never the table.
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.schemas import (
    CHANGELOG_SCHEMA,
    INTERNAL_FIELDS,
    unify_schemas,
)
from radiant_portal_pipeline_ray.stages.merge import make_merge_writer
from radiant_portal_pipeline_ray.stages.normalize import (
    make_event_normalizer,
    make_part_scout,
    make_snapshot_caster,
)
from radiant_portal_pipeline_ray.state.manifest import (
    CommitConflict,
    Lake,
    Manifest,
    PartitionState,
)
from radiant_portal_pipeline_ray.state.partitioner import Partitioner

_INTERNAL_NAMES = {f.name for f in INTERNAL_FIELDS}


class ConcurrentWriterConflict(Exception):
    """A concurrent writer advanced a partition this apply merged from —
    the staged merge output is stale (its carried-forward rows and doc-id
    ranges were computed against an older base). Fail fast and re-run the
    apply; silently committing would overwrite the other writer's rows and
    could collide doc_id ranges."""


def _resolve_paths(changelog: str | list[str]) -> list[str]:
    if isinstance(changelog, str):
        if os.path.isdir(changelog):
            return sorted(glob.glob(os.path.join(changelog, "*.parquet")))
        return [changelog]
    return list(changelog)




class CdcEngine:
    def __init__(
        self,
        lake_root: str,
        config: EngineConfig | None = None,
        lake: Lake | None = None,
    ):
        # an explicit Lake carries its fsspec filesystem with it — required
        # when lake_root is an ALREADY-STRIPPED object-store path (e.g. the
        # '/lake' a memory:// root strips to), which Lake(root) would
        # otherwise mistake for a POSIX path and os.makedirs locally
        self.lake = lake if lake is not None else Lake(lake_root)
        self.cfg = config or EngineConfig()
        #: when True, this apply round makes NO routing-state changes: no
        #: bootstrap pre-salt, no new salting decisions (pending migrations
        #: already committed still execute — they move carried rows, not the
        #: url→part map). apply_backlog sets this on every writer so the
        #: partition-disjointness it scheduled under stays valid for the
        #: whole backlog; without it a mid-backlog re-salt re-routes urls
        #: into partitions another concurrent job owns, and the loser's
        #: events land below the winner's advanced watermark — silent loss.
        self.freeze_routing = False
        #: when True, stash ``Dataset.stats()`` of the last apply's normalize
        #: and merge stages on the engine (perf debugging only)
        self.debug_stats = False
        self.last_stats: dict[str, str] = {}

    def _read_parallelism(self) -> int:
        if self.cfg.read_parallelism:
            return self.cfg.read_parallelism
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        return 2 * cpus

    # ------------------------------------------------------------------
    def apply(self, changelog: str | list[str]) -> dict:
        t0 = time.time()
        cfg = self.cfg
        paths = _resolve_paths(changelog)
        current = self.lake.current_manifest()
        # Guard: the base hash-partition domain is baked into every committed
        # row's routing. Applying with a different n_parts would re-route urls
        # away from their carried state (duplicate live urls, corrupt
        # watermark domain). The manifest records n_parts; cross-check it.
        if current is not None and current.n_parts and current.n_parts != cfg.n_parts:
            raise ValueError(
                f"lake was committed with n_parts={current.n_parts} but config "
                f"requests n_parts={cfg.n_parts}; base partition count is "
                "immutable for an existing lake (salting splits hot domains "
                "instead — see Partitioner)"
            )
        # salt-slot hash version is immutable per lake (like n_parts): v1
        # lakes keep CRC-32 routing; v2 lakes verify the polars-hash canary
        # so a library upgrade can't silently re-route salted urls away from
        # their committed rows.
        from radiant_portal_pipeline_ray.functions.hashing import (
            salt_hash_fingerprint,
        )

        salt_v = (
            current.salt_hash_version
            if current is not None
            else cfg.salt_hash_version_default
        )
        salt_fp = salt_hash_fingerprint() if salt_v >= 2 else None
        if (
            current is not None
            and salt_v >= 2
            and current.salt_hash_fingerprint
            and current.salt_hash_fingerprint != salt_fp
        ):
            raise RuntimeError(
                "salt hash fingerprint mismatch: this host's polars hash "
                "differs from the one the lake's salted routing was "
                "committed under (polars upgrade?). Pin the old polars, or "
                "migrate: compact every salted partition after re-routing "
                "via pending_migrations."
            )
        self._salt_v, self._salt_fp = salt_v, salt_fp

        def _noop_report(events_in: int) -> dict:
            return {
                "events_in": events_in,
                "noop": True,
                "version": current.version if current else None,
                "rows_upserted": 0,
                "rows_deleted": 0,
                "rows_carried": 0,
                "parts_changed": 0,
                "wall_s": time.time() - t0,
            }

        if not paths:
            return _noop_report(0)
        # consumption ledger for the tail loop (pipelines/tail.py): input
        # basename → max lsn, folded into the commit below so file
        # consumption is exactly-once with the manifest CAS
        from radiant_portal_pipeline_ray.pipelines.tail import input_max_lsn

        self._input_ledger = {
            os.path.basename(p): input_max_lsn(p) for p in paths
        }
        timings: dict[str, float] = {}
        t_mark = time.time()

        def _lap(name: str) -> None:
            nonlocal t_mark
            now = time.time()
            timings[name] = round(now - t_mark, 3)
            t_mark = now

        watermarks = current.watermarks() if current else {}
        min_wm = current.min_watermark() if current else -1

        partitioner = Partitioner(
            n_parts=cfg.n_parts,
            salt_map=dict(current.salt_map) if current else {},
            next_part=current.next_part if current else cfg.n_parts,
            hot_counts=dict(current.metrics.get("hot_counts", {})) if current else {},
            salt_threshold_rows=cfg.salt_threshold_rows,
            salt_target_rows=cfg.salt_target_rows,
            salt_headroom=cfg.salt_headroom,
        )
        # Bootstrap pre-salting: on an EMPTY lake every domain is new, so a
        # hot domain can be salted BEFORE any row routes — no committed rows
        # means no migration, killing both the first-round zipf-head merge
        # straggler and the next round's migration reshuffle. A column-pruned
        # url read (KBs per file) counts events per domain; the decisions'
        # migration lists are discarded (nothing to migrate). Deterministic
        # (exact counts), so a retried round re-derives the same salt map.
        if current is None and cfg.salt_threshold_rows and not self.freeze_routing:
            partitioner.observe_domain_rows(self._bootstrap_domain_counts(paths))

        # ---- schema discovery & unification (driver-side footer reads,
        # threaded: a binlog tail is many small files and serial footer
        # round-trips add a fixed per-round cost) -----------------------
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=16) as ex:
            file_metas = dict(zip(paths, ex.map(pq.read_metadata, paths)))
        file_schemas: dict[bytes, tuple[pa.Schema, list[str]]] = {}
        for p in paths:
            sch = file_metas[p].schema.to_arrow_schema()
            sch = pa.schema([pa.field(f.name, f.type) for f in sch])  # drop metadata
            key = sch.serialize().to_pybytes()
            file_schemas.setdefault(key, (sch, []))[1].append(p)
        event_schema = unify_schemas(
            [CHANGELOG_SCHEMA] + [s for s, _ in file_schemas.values()]
        )
        new_data_fields = [
            f for f in event_schema if f.name not in ("op", "lsn")
        ]
        old_data_fields = (
            [f for f in current.schema if f.name not in _INTERNAL_NAMES]
            if current and current.schema
            else []
        )
        data_schema = unify_schemas(
            [pa.schema(old_data_fields), pa.schema(new_data_fields)]
        ) if old_data_fields else pa.schema(new_data_fields)
        snapshot_schema = pa.schema(list(data_schema) + INTERNAL_FIELDS)
        union_schema = pa.schema([pa.field("op", pa.string())] + list(snapshot_schema))

        # ---- delta plan: read → normalize ---------------------------------
        filt = (pc.field("lsn") > pa.scalar(min_wm)) if current else None
        normalizer = make_event_normalizer(
            event_schema,
            union_schema,
            cfg.n_parts,
            partitioner.salt_map,
            watermarks,
            partitioner.max_part_id(),
            salt_hash_version=salt_v,
        )
        # read-splitting: without an explicit block count, a 2-file tail
        # round yields ~2 read tasks and normalize can't use the cluster
        # (splits land on parquet row-group boundaries)
        read_blocks = self._read_parallelism()
        if cfg.exchange == "task":
            return self._apply_task_exchange(
                t0,
                timings,
                _lap,
                current,
                partitioner,
                paths,
                file_metas,
                event_schema,
                union_schema,
                snapshot_schema,
                watermarks,
                min_wm,
                _noop_report,
            )
        if cfg.exchange == "actor":
            report = self._apply_actor_exchange(
                t0,
                timings,
                _lap,
                current,
                partitioner,
                file_schemas,
                filt,
                read_blocks,
                event_schema,
                union_schema,
                snapshot_schema,
                watermarks,
                _noop_report,
            )
            return report
        delta = None
        for _, (sch, group_paths) in sorted(file_schemas.items()):
            # prune incoming text at the decode (recomputed from html)
            cols = [c for c in sch.names if c != "text"] if "text" in sch.names else None
            ds = rd.read_parquet(
                group_paths, filter=filt, columns=cols,
                override_num_blocks=read_blocks,
            ).map_batches(
                normalizer,
                batch_format="pyarrow",
                batch_size=cfg.normalize_batch_size,
            )
            delta = ds if delta is None else delta.union(ds)
        _lap("plan")

        # ---- changed partitions + pending migrations ----------------------
        # Default: materialize the normalized delta ONCE and probe it for
        # parts. Materializing beats keeping the chain lazy into the merge's
        # sort: Ray's sort re-samples its (lazy) input for range boundaries,
        # which re-executes the expensive normalize (measured: lazy chain was
        # ~30% slower end-to-end at sf0.1 on 8 and 32 CPUs).
        # cfg.sparse_scout instead probes a column-pruned (url, lsn) read —
        # the right tradeoff when the tail is mostly pre-watermark (resume /
        # replay-from-backlog) and normalizing it eagerly would be wasted.
        pending = dict(current.pending_migrations) if current else {}
        if cfg.sparse_scout:
            scout = make_part_scout(
                cfg.n_parts,
                partitioner.salt_map,
                watermarks,
                partitioner.max_part_id(),
                salt_hash_version=self._salt_v,
            )
            parts_in_delta: set[int] | None = set()
            for _, (sch, group_paths) in sorted(file_schemas.items()):
                sc = rd.read_parquet(
                    group_paths, columns=["url", "lsn"], filter=filt
                ).map_batches(scout, batch_format="pyarrow")
                uniq = sc.unique("part")  # None when all pre-watermark
                parts_in_delta.update(int(p) for p in (uniq or []))
            delta_has_rows = bool(parts_in_delta)
        else:
            delta = delta.materialize()
            if self.debug_stats:
                self.last_stats["normalize"] = delta.stats()
            # No separate unique() pass over the delta: a merge group only
            # forms for a partition that actually has rows, so the carried
            # side below can be offered for EVERY committed partition
            # (metadata-only map) and unchanged partitions simply never
            # merge. Saves one all-to-all per round.
            parts_in_delta = None  # unknown without an extra pass
            delta_has_rows = bool(delta.count())  # metadata on materialized
        if not delta_has_rows and not pending:
            return _noop_report(0)
        _lap("scout")

        # ---- carried-forward side -----------------------------------------
        # Routing is only changing for partitions involved in a pending salt
        # migration; ONLY their carried rows enter the shuffle (the snapshot
        # caster re-routes them). Every other changed partition's carried
        # rows are read LOCALLY inside its merge task from the committed
        # per-partition files — the exchange carries just the delta.
        migration_parts: set[int] = set()
        for d, old_parts in pending.items():
            migration_parts.update(old_parts)
            migration_parts.update(partitioner.salt_map.get(d, []))
        combined = delta
        old_files = []
        local_carry: dict[int, list[str]] = {}
        if current:
            # candidate carried partitions: the scouted delta set when known
            # (sparse_scout), else every committed partition — local_carry is
            # a metadata-only map and the merge only reads a partition's
            # carried files if that partition actually formed a group.
            if parts_in_delta is None:
                candidates = set(current.partitions) | migration_parts
            else:
                candidates = set(parts_in_delta) | migration_parts
            for p in sorted(candidates):
                st = current.partitions.get(p)
                if not st:
                    continue
                paths_p = [self.lake.abspath(f) for f in st.files]
                if p in migration_parts:
                    old_files.extend(paths_p)
                elif paths_p:
                    local_carry[p] = paths_p
        if old_files:
            caster = make_snapshot_caster(
                union_schema, cfg.n_parts, partitioner.salt_map,
                salt_hash_version=self._salt_v,
            )
            old_ds = rd.read_parquet(
                old_files,
                override_num_blocks=read_blocks,
                filesystem=self.lake.pyarrow_fs(),
            ).map_batches(
                caster, batch_format="pyarrow", batch_size=cfg.normalize_batch_size
            )
            if not cfg.sparse_scout:
                # same rationale as the delta: the merge sort re-samples lazy
                # inputs, re-running the snapshot read+cast
                old_ds = old_ds.materialize()
            combined = old_ds if not delta_has_rows else delta.union(old_ds)

        # ---- per-partition LWW merge + staged write -----------------------
        txn_id = self.lake.new_txn_id()
        staging = self.lake.staging_dir(txn_id)
        writer = make_merge_writer(
            txn_id=txn_id,
            staging_dir=staging,
            snapshot_schema=snapshot_schema,
            next_doc_seq={
                p: st.next_doc_seq
                for p, st in (current.partitions.items() if current else [])
            },
            doc_id_part_shift=cfg.doc_id_part_shift,
            target_rows_per_file=cfg.target_rows_per_file,
            compression=cfg.compression,
            local_carry_files=local_carry,
            union_schema=union_schema,
            filesystem=self.lake.filesystem,
        )
        meta_ds = combined.groupby("part").map_groups(writer, batch_format="pyarrow")
        meta_rows = meta_ds.take_all()
        if self.debug_stats:
            self.last_stats["merge"] = meta_ds.stats()
        _lap("merge")
        # Ray Data plan objects are reference cycles; without an explicit
        # collect the dropped per-round Datasets pin their materialized
        # blocks in the object store across rounds (measured: +0.5 GB and
        # 2x slower apply by round 4 of a replay). ~10 ms, once per round.
        del delta, combined, meta_ds
        import gc

        gc.collect()
        return self._post_merge(
            t0,
            timings,
            _lap,
            current,
            partitioner,
            meta_rows,
            pending,
            txn_id,
            snapshot_schema,
            watermarks,
            _noop_report,
        )

    # ------------------------------------------------------------------
    def apply_backlog(
        self, jobs: list[dict], max_concurrency: int = 1
    ) -> list[dict]:
        """Priority-ordered work-list (W4): a backlog of pending changelog
        work units applied in ascending ``priority`` (the reference's
        STAT < ASAP < URGENT < ROUTINE ordering of per-partition import
        runs, `radiant/tasks/starrocks/partition.py:234-256` /
        `radiant/dags/import_radiant.py:180-189`); ties keep submission
        order.

        Each job is ``{"paths": <changelog paths>, "priority": int}``. As in
        the reference, a work unit is partition-scoped (one import-part run
        per partition): reordering is only meaningful across jobs touching
        DIFFERENT partitions — two jobs tailing the same partition must run
        in submission (lsn) order, since the per-partition watermark drops
        any event at-or-below it (idempotence guard). That constraint is
        ENFORCED here: each job's touched partitions are probed with a
        column-pruned (url-only) read, and the scheduler picks the best
        (priority, submission) job whose earlier-submitted same-partition
        jobs have all run — priority ordering that can never reorder a
        partition's own stream. Returns the reports in EXECUTION order,
        each annotated with its submission index.

        ``max_concurrency > 1`` is the multi-writer mode (reference
        analogue: one concurrent import-part run per partition fanned in to
        a single committer, `radiant/dags/import_snv_vcf.py:47-49`): each
        wave dispatches up to that many PARTITION-DISJOINT runnable jobs,
        each through its own fresh ``CdcEngine`` writer, serialized only at
        the manifest commit — the put-if-absent CAS orders the commits and
        ``_commit_with_retry`` rebases each writer's manifest over the
        other's committed version (valid exactly because the wave is
        partition-disjoint). The one cross-partition coupling is routing
        state: if two writers both make salting decisions, the later commit
        raises ``ConcurrentWriterConflict``; that job's staged files become
        GC-able orphans (its watermark never advanced) and it is re-run
        sequentially after the wave — a pure re-execution, never a partial
        state.
        """
        from radiant_portal_pipeline_ray.functions.hashing import (
            assign_parts,
            extract_domain,
        )

        current = self.lake.current_manifest()
        partitioner = Partitioner(
            n_parts=self.cfg.n_parts,
            salt_map=dict(current.salt_map) if current else {},
            next_part=current.next_part if current else self.cfg.n_parts,
        )
        job_parts: list[set[int]] = []
        for j in jobs:
            parts: set[int] = set()
            for p in _resolve_paths(j["paths"]):
                urls = pq.read_table(p, columns=["url"]).column("url")
                doms = extract_domain(urls)
                pp = assign_parts(
                    urls, doms, self.cfg.n_parts, partitioner.salt_map,
                    salt_hash_version=(
                        current.salt_hash_version if current is not None else 2
                    ),
                )
                parts.update(
                    int(x) for x in pc.unique(pp).to_pylist() if x is not None
                )
            job_parts.append(parts)

        remaining = list(range(len(jobs)))
        out = []
        # Committed-but-unexecuted migrations run inside the FIRST apply of
        # the backlog and touch partitions the url-only scout cannot see
        # (the drained old parts and the salt targets receive carried rows).
        # Run that first job solo; afterwards pending is drained and — with
        # routing frozen below — stays empty for the rest of the backlog.
        first_solo = bool(current is not None and current.pending_migrations)

        def _fresh_writer() -> "CdcEngine":
            eng = CdcEngine(
                self.lake.root,
                self.cfg,
                lake=Lake(self.lake.root, self.lake.filesystem)
                if self.lake.filesystem is not None
                else None,
            )
            eng.freeze_routing = True
            return eng

        def _apply_frozen(paths) -> dict:
            prev, self.freeze_routing = self.freeze_routing, True
            try:
                return self.apply(paths)
            finally:
                self.freeze_routing = prev

        def _run_concurrent(wave: list[int]) -> list[dict]:
            from concurrent.futures import ThreadPoolExecutor

            def one(i: int):
                try:
                    return _fresh_writer().apply(jobs[i]["paths"])
                except ConcurrentWriterConflict:
                    # a concurrent writer advanced a merged-from partition;
                    # the failed writer's staged files are unreferenced
                    # orphans and its watermarks never advanced — safe to
                    # re-run sequentially after the wave.
                    return None

            with ThreadPoolExecutor(max_workers=len(wave)) as ex:
                reps = list(ex.map(one, wave))
            return [
                rep if rep is not None else _apply_frozen(jobs[i]["paths"])
                for i, rep in zip(wave, reps)
            ]

        while remaining:
            runnable = sorted(
                (
                    i
                    for i in remaining
                    if not any(
                        k < i and job_parts[k] & job_parts[i] for k in remaining
                    )
                ),
                key=lambda i: (jobs[i].get("priority", 1_000_000), i),
            )
            if max_concurrency <= 1 or first_solo:
                wave = runnable[:1]
                first_solo = False
            else:
                # greedy by (priority, submission): add a runnable job to the
                # wave only if its partitions are disjoint from every job
                # already in it — the invariant the commit rebase relies on
                wave, taken = [], set()
                for i in runnable:
                    if len(wave) >= max_concurrency:
                        break
                    if job_parts[i] & taken:
                        continue
                    wave.append(i)
                    taken |= job_parts[i]
            for i in wave:
                remaining.remove(i)
            reps = (
                [_apply_frozen(jobs[wave[0]]["paths"])]
                if len(wave) == 1
                else _run_concurrent(wave)
            )
            for i, rep in zip(wave, reps):
                rep["job_index"] = i
                rep["priority"] = jobs[i].get("priority", 1_000_000)
                out.append(rep)

        # routing decisions deferred by freeze_routing: fold the per-domain
        # live-row observations from every wave (max — they are absolute
        # counts, same semantic as Partitioner.observe_domain_rows) and make
        # the salting decision ONCE, now that no scheduled job depends on
        # the old map. Migrations execute on the next apply as usual.
        totals: dict[str, int] = {}
        for rep in out:
            for d, n in rep.get("domain_rows", {}).items():
                if int(n) > totals.get(d, 0):
                    totals[d] = int(n)
        routed = self.commit_routing_decisions(totals)
        if routed:
            for rep in out:
                rep.setdefault("post_backlog_salted", routed["salted_domains"])
        return out

    def commit_routing_decisions(self, domain_totals: dict[str, int]) -> dict | None:
        """Evaluate hot-domain salting from observed live-row counts and, if
        any domain crosses the threshold, publish a ROUTING-ONLY manifest
        version: identical partitions/watermarks/schema, updated salt_map /
        pending_migrations / next_part. Used by ``apply_backlog`` (whose
        waves run with ``freeze_routing`` set); retries on version conflict
        by re-evaluating against the new current manifest."""
        if not domain_totals:
            return None
        while True:
            current = self.lake.current_manifest()
            if current is None:
                return None
            partitioner = Partitioner(
                n_parts=self.cfg.n_parts,
                salt_map=dict(current.salt_map),
                next_part=(
                    current.next_part
                    if current.next_part is not None
                    else self.cfg.n_parts
                ),
                salt_threshold_rows=self.cfg.salt_threshold_rows,
                salt_target_rows=self.cfg.salt_target_rows,
                salt_headroom=self.cfg.salt_headroom,
            )
            decisions = partitioner.observe_domain_rows(domain_totals)
            if not decisions:
                return None
            pending = dict(current.pending_migrations)
            for d in decisions:
                pending[d.domain] = d.old_parts
            man = Manifest(
                version=current.version + 1,
                txn_id=self.lake.new_txn_id(),
                parent_version=current.version,
                schema=current.schema,
                n_parts=current.n_parts,
                partitions=dict(current.partitions),
                salt_map=partitioner.salt_map,
                salt_hash_version=current.salt_hash_version,
                salt_hash_fingerprint=current.salt_hash_fingerprint,
                pending_migrations=pending,
                next_part=partitioner.next_part,
                metrics={"routing_only": True},
                consumed_inputs=dict(current.consumed_inputs),
                quarantine_files=list(current.quarantine_files),
            )
            try:
                self.lake.commit(man)
                return {
                    "version": man.version,
                    "salted_domains": [d.domain for d in decisions],
                }
            except CommitConflict:
                continue

    # ------------------------------------------------------------------
    @staticmethod
    def _bootstrap_domain_counts(paths: list[str]) -> dict[str, int]:
        """Event counts per domain from a column-pruned ``url`` read
        (threaded; pyarrow releases the GIL for reads and kernels). Event
        count upper-bounds live rows — over-salting a duplicate-heavy
        domain just allocates headroom it would get anyway."""
        from concurrent.futures import ThreadPoolExecutor

        from radiant_portal_pipeline_ray.functions.hashing import (
            extract_domain,
        )

        def one(p: str) -> dict[str, int]:
            urls = pq.read_table(p, columns=["url"]).column("url")
            doms = extract_domain(urls)
            vc = pa.table({"d": doms}).group_by("d").aggregate([("d", "count")])
            return dict(
                zip(vc.column("d").to_pylist(), vc.column("d_count").to_pylist())
            )

        counts: dict[str, int] = {}
        with ThreadPoolExecutor(max_workers=16) as ex:
            for d in ex.map(one, paths):
                for k, v in d.items():
                    counts[k] = counts.get(k, 0) + int(v)
        return counts

    # ------------------------------------------------------------------
    def _apply_task_exchange(
        self,
        t0,
        timings,
        _lap,
        current,
        partitioner,
        paths,
        file_metas,
        event_schema,
        union_schema,
        snapshot_schema,
        watermarks,
        min_wm,
        noop_report,
    ) -> dict:
        """Single-materialization apply round: fused read+normalize+split
        tasks emit one plasma object per (task, bucket); per-bucket merge
        tasks consume their ref column zero-copy. No sort, no boundary
        sampling, no second pass over the delta — see stages/taskshuffle.py
        for the copy-count and retry/lineage contract."""
        import gc

        import ray

        from radiant_portal_pipeline_ray.stages.taskshuffle import (
            chunk_units,
            enumerate_units,
            fan_subsplit,
            merge_bucket_task,
            split_task,
            two_level_plan,
        )

        cfg = self.cfg
        normalizer = make_event_normalizer(
            event_schema,
            union_schema,
            cfg.n_parts,
            partitioner.salt_map,
            watermarks,
            partitioner.max_part_id(),
            salt_hash_version=self._salt_v,
            quarantine=True,
        )
        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        # enough buckets that one bucket-merge never gates the round, few
        # enough that the (tasks × buckets) object count stays bounded
        n_buckets = max(8, min(2 * cpus, partitioner.max_part_id() + 1))

        pending = dict(current.pending_migrations) if current else {}
        migration_parts: set[int] = set()
        for d, old_parts in pending.items():
            migration_parts.update(old_parts)
            migration_parts.update(partitioner.salt_map.get(d, []))
        mig_files: list[str] = []
        if current:
            for p in sorted(migration_parts):
                st = current.partitions.get(p)
                if st:
                    mig_files.extend(self.lake.abspath(f) for f in st.files)

        # fused read+normalize+split fan-out (row-group-granular chunks);
        # migrating partitions' carried rows go through the same exchange
        # under the snapshot caster (their routing is changing)
        units = enumerate_units(paths, file_metas)
        chunks = chunk_units(units, 2 * cpus)
        lake_fs = self.lake.filesystem
        mig_chunks: list = []
        if mig_files:
            mig_chunks = chunk_units(
                enumerate_units(mig_files, filesystem=lake_fs), 2 * cpus
            )
        # second-level split when the (tasks × buckets) ref matrix would
        # exceed the driver budget: split tasks emit G group objects, one
        # subsplit task per group fans them to the final buckets
        delta_bytes = 0
        for p in paths:
            md = file_metas.get(p) if file_metas else None
            if md is not None:
                delta_bytes += sum(
                    md.row_group(i).total_byte_size
                    for i in range(md.num_row_groups)
                )
        delta_bytes = delta_bytes or (len(units) << 24)
        # migration rounds push the rewritten partitions' carried rows
        # through the SAME split/subsplit tasks — count their bytes too, or
        # a small-delta/big-migration round under-sizes n_groups and one
        # subsplit task concatenates far more than the per-group heap bound
        for f in mig_files:
            try:
                delta_bytes += (
                    lake_fs.size(f) if lake_fs is not None else os.path.getsize(f)
                )
            except (OSError, FileNotFoundError):
                pass
        plan = two_level_plan(
            len(chunks) + len(mig_chunks), n_buckets, delta_bytes
        )
        n_groups = 0
        split_buckets = n_buckets
        if plan is not None:
            n_groups, n_buckets = plan
            split_buckets = n_groups
        task = split_task.options(num_returns=1 + split_buckets)
        min_lsn = min_wm if current else None
        # changelog reads prune the incoming text column at the decode —
        # the normalizer recomputes text from html unconditionally, so the
        # ~40%-of-bytes text column is pure wasted I/O (VERDICT r4 #6)
        returns = [
            task.remote(
                ch, normalizer, split_buckets, min_lsn, None, ("text",),
                fault_inject=cfg.fault_inject,
            )
            for ch in chunks
        ]
        if mig_chunks:
            caster = make_snapshot_caster(
                union_schema, cfg.n_parts, partitioner.salt_map,
                salt_hash_version=self._salt_v,
            )
            for ch in mig_chunks:
                returns.append(
                    task.remote(ch, caster, split_buckets, None, lake_fs)
                )
        stats_refs = [r[0] for r in returns]
        if n_groups:
            bucket_cols = fan_subsplit(
                [list(r[1:]) for r in returns], None, n_buckets, n_groups
            )
        else:
            mat = [list(r[1:]) for r in returns]
            bucket_cols = [[row[b] for row in mat] for b in range(n_buckets)]
        _lap("plan")

        events_pushed = 0
        parts_seen: set[int] = set()
        q_tabs: list = []
        q_dropped = 0
        for s in ray.get(stats_refs):
            events_pushed += int(s["events"])
            parts_seen.update(int(p) for p in s["parts"])
            if s.get("quarantine") is not None:
                q_tabs.append(s["quarantine"])
                q_dropped += int(s.get("quarantine_dropped", 0))
        changed_parts = set(parts_seen)
        for d, old_parts in pending.items():
            changed_parts.update(old_parts)
            changed_parts.update(partitioner.salt_map.get(d, []))
        if not changed_parts:
            if q_tabs:
                # the whole batch was malformed: commit a quarantine-only
                # version so the DLQ record survives
                return self._commit_quarantine_only(
                    t0, current, q_tabs, q_dropped, noop_report
                )
            return noop_report(0)

        # stable changed partitions merge their committed files locally
        local_carry: dict[int, list[str]] = {}
        if current:
            for p in sorted(changed_parts - migration_parts):
                st = current.partitions.get(p)
                if st and st.files:
                    local_carry[p] = [self.lake.abspath(f) for f in st.files]
        _lap("scout")

        from radiant_portal_pipeline_ray.stages.merge import MergeKernel

        txn_id = self.lake.new_txn_id()
        quarantine_info = self._write_quarantine(txn_id, q_tabs, q_dropped)
        staging = self.lake.staging_dir(txn_id)
        kernel = MergeKernel(
            txn_id=txn_id,
            staging_dir=staging,
            snapshot_schema=snapshot_schema,
            next_doc_seq={
                p: st.next_doc_seq
                for p, st in (current.partitions.items() if current else [])
            },
            doc_id_part_shift=cfg.doc_id_part_shift,
            target_rows_per_file=cfg.target_rows_per_file,
            compression=cfg.compression,
            local_carry_files=local_carry,
            union_schema=union_schema,
            filesystem=lake_fs,
            fault_inject=cfg.fault_inject,
        )
        # changed parts that shuffled no rows (local-carry-only partitions of
        # a migrating domain) still need a merge pass from an empty delta
        silent = changed_parts - parts_seen
        extra: dict[int, list[int]] = {}
        for p in silent:
            extra.setdefault(p % n_buckets, []).append(p)
        active = sorted(
            {p % n_buckets for p in changed_parts}
        )
        merge_refs = [
            merge_bucket_task.remote(
                kernel,
                bucket_cols[b],
                sorted(extra.get(b, [])),
            )
            for b in active
        ]
        meta_rows = [m for sub in ray.get(merge_refs) for m in sub]
        _lap("merge")
        del bucket_cols, returns, merge_refs
        gc.collect()
        return self._post_merge(
            t0,
            timings,
            _lap,
            current,
            partitioner,
            meta_rows,
            pending,
            txn_id,
            snapshot_schema,
            watermarks,
            noop_report,
            quarantine=quarantine_info,
        )

    # ------------------------------------------------------------------
    def _apply_actor_exchange(
        self,
        t0,
        timings,
        _lap,
        current,
        partitioner,
        file_schemas,
        filt,
        read_blocks,
        event_schema,
        union_schema,
        snapshot_schema,
        watermarks,
        noop_report,
    ) -> dict:
        """Streaming apply round: normalize map tasks push partition-routed
        sub-tables into shard actors WHILE reading (no sort, no boundary
        sampling, no materialize barrier); per-shard finalize merges + stages.
        See stages/exchange.py for the exchange's retry/failure contract."""
        import gc

        import ray

        from radiant_portal_pipeline_ray.stages.exchange import (
            MergeShard,
            run_exchange,
        )

        cfg = self.cfg
        normalizer = make_event_normalizer(
            event_schema,
            union_schema,
            cfg.n_parts,
            partitioner.salt_map,
            watermarks,
            partitioner.max_part_id(),
            salt_hash_version=self._salt_v,
        )
        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        n_shards = max(4, min(cpus, partitioner.max_part_id() + 1))
        shards = [MergeShard.remote(i, n_shards) for i in range(n_shards)]
        _lap("plan")
        try:
            from radiant_portal_pipeline_ray.stages.exchange import (
                build_exchange,
                consume_stats,
            )

            # migration topology is known from the committed manifest, so the
            # delta exchange AND the migrating-partition carried exchange are
            # built upfront and consumed in ONE streaming execution
            pending = dict(current.pending_migrations) if current else {}
            migration_parts: set[int] = set()
            for d, old_parts in pending.items():
                migration_parts.update(old_parts)
                migration_parts.update(partitioner.salt_map.get(d, []))
            mig_files: list[str] = []
            if current:
                for p in sorted(migration_parts):
                    st = current.partitions.get(p)
                    if st:
                        mig_files.extend(self.lake.abspath(f) for f in st.files)

            # one exchange branch per schema group (normalize aligns schemas
            # INSIDE the transform, so raw reads must not be unioned)
            stats = None
            for _, (sch, group_paths) in sorted(file_schemas.items()):
                cols = [c for c in sch.names if c != "text"] if "text" in sch.names else None
                ds = rd.read_parquet(
                    group_paths, filter=filt, columns=cols,
                    override_num_blocks=read_blocks,
                )
                st_ds = build_exchange(ds, normalizer, shards, n_shards)
                stats = st_ds if stats is None else stats.union(st_ds)
            if mig_files:
                caster = make_snapshot_caster(
                    union_schema, cfg.n_parts, partitioner.salt_map,
                    salt_hash_version=self._salt_v,
                )
                st_ds = build_exchange(
                    rd.read_parquet(
                        mig_files,
                        override_num_blocks=read_blocks,
                        filesystem=self.lake.pyarrow_fs(),
                    ),
                    caster,
                    shards,
                    n_shards,
                )
                stats = st_ds if stats is None else stats.union(st_ds)
            events_pushed, parts_seen = consume_stats(stats)

            changed_parts = set(parts_seen)
            for d, old_parts in pending.items():
                changed_parts.update(old_parts)
                changed_parts.update(partitioner.salt_map.get(d, []))
            if not changed_parts:
                return noop_report(0)

            # stable changed partitions merge their committed files locally
            local_carry: dict[int, list[str]] = {}
            if current:
                for p in sorted(changed_parts - migration_parts):
                    st = current.partitions.get(p)
                    if st and st.files:
                        local_carry[p] = [
                            self.lake.abspath(f) for f in st.files
                        ]
            _lap("scout")

            # ---- per-shard finalize: merge + staged write -----------------
            from radiant_portal_pipeline_ray.stages.merge import MergeKernel

            txn_id = self.lake.new_txn_id()
            staging = self.lake.staging_dir(txn_id)
            kernel = MergeKernel(
                txn_id=txn_id,
                staging_dir=staging,
                snapshot_schema=snapshot_schema,
                next_doc_seq={
                    p: st.next_doc_seq
                    for p, st in (
                        current.partitions.items() if current else []
                    )
                },
                doc_id_part_shift=cfg.doc_id_part_shift,
                target_rows_per_file=cfg.target_rows_per_file,
                compression=cfg.compression,
                local_carry_files=local_carry,
                union_schema=union_schema,
                filesystem=self.lake.filesystem,
            )
            # changed parts that never pushed a row (e.g. local-carry-only
            # partitions of a migrating domain) still need a merge pass
            silent = changed_parts - parts_seen
            extra = {i: [] for i in range(n_shards)}
            for p in silent:
                extra[p % n_shards].append(p)
            # Finalize = the CPU-heavy merge+write. Shard actors are
            # num_cpus=0 (they must coexist with the map stage while
            # buffering), so Ray's scheduler would happily run EVERY
            # shard's finalize at once regardless of the cluster's CPU
            # budget — on a small cluster that oversubscribes cores (and
            # makes a num_cpus=N session lie about N). Throttle in-flight
            # finalizes to the CPU budget instead.
            window = max(1, int(ray.cluster_resources().get("CPU", n_shards)))
            pending_refs = [
                s.finalize.remote(kernel, extra[i])
                for i, s in enumerate(shards[:window])
            ]
            queued = list(enumerate(shards))[window:]
            metas = []
            while pending_refs:
                done, pending_refs = ray.wait(pending_refs, num_returns=1)
                metas.append(ray.get(done[0]))
                if queued:
                    i, s = queued.pop(0)
                    pending_refs.append(s.finalize.remote(kernel, extra[i]))
            meta_rows = [m for sub in metas for m in sub]
            _lap("merge")
        finally:
            for s in shards:
                ray.kill(s)
            del shards
            gc.collect()
        return self._post_merge(
            t0,
            timings,
            _lap,
            current,
            partitioner,
            meta_rows,
            pending,
            txn_id,
            snapshot_schema,
            watermarks,
            noop_report,
        )

    # ------------------------------------------------------------------
    def _write_quarantine(
        self, txn_id: str, q_tabs: list, q_dropped: int
    ) -> dict | None:
        """Write one dead-letter file for this txn (malformed events +
        reason column). Same pre-commit contract as promoted data files: a
        crash before the commit leaves it unreferenced → gc_orphans
        reclaims it after quiescence."""
        if not q_tabs:
            return None
        qtable = pa.concat_tables(q_tabs, promote_options="permissive")
        rel = f"data/quarantine/{txn_id}.parquet"
        abspath = self.lake.abspath(rel)
        self.lake._makedirs(abspath.rsplit("/", 1)[0])
        pq.write_table(
            qtable,
            abspath,
            compression="zstd",
            filesystem=self.lake.pyarrow_fs()
            if self.lake.filesystem is not None
            else None,
        )
        u, c = np.unique(
            qtable.column("reason").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        by_reason = dict(zip(u.tolist(), c.tolist()))
        return {
            "file": rel,
            "rows": qtable.num_rows,
            "dropped_overflow": q_dropped,
            "by_reason": {k: int(v) for k, v in by_reason.items()},
        }

    def _commit_quarantine_only(
        self, t0, current, q_tabs: list, q_dropped: int, noop_report
    ) -> dict:
        """Every event in the batch was malformed: no partition changes, but
        the DLQ record must still commit (a silent noop would lose it)."""
        txn_id = self.lake.new_txn_id()
        qinfo = self._write_quarantine(txn_id, q_tabs, q_dropped)
        base = self.lake.current_manifest()
        man = Manifest(
            version=(base.version + 1) if base else 1,
            txn_id=txn_id,
            parent_version=base.version if base else None,
            schema=base.schema if base else None,
            n_parts=base.n_parts if base else self.cfg.n_parts,
            partitions=dict(base.partitions) if base else {},
            salt_map=dict(base.salt_map) if base else {},
            salt_hash_version=base.salt_hash_version if base else self._salt_v,
            salt_hash_fingerprint=(
                base.salt_hash_fingerprint if base else self._salt_fp
            ),
            pending_migrations=dict(base.pending_migrations) if base else {},
            next_part=base.next_part if base else self.cfg.n_parts,
            metrics={"quarantine_only": True, "quarantine": qinfo},
            consumed_inputs={
                **(dict(base.consumed_inputs) if base else {}),
                **(getattr(self, "_input_ledger", {}) or {}),
            },
            quarantine_files=(list(base.quarantine_files) if base else [])
            + [qinfo["file"]],
        )
        committed = self.lake.commit(man)
        rep = noop_report(0)
        rep.update(
            {
                "noop": False,
                "version": committed.version,
                "rows_quarantined": qinfo["rows"],
                "quarantine": qinfo,
            }
        )
        return rep

    def read_quarantine(self, version: int | None = None) -> "rd.Dataset":
        """Dead-letter queue as a streaming Dataset (malformed change events
        with their ``reason``); empty Dataset when nothing was quarantined."""
        man = (
            self.lake.read_manifest(version)
            if version is not None
            else self.lake.current_manifest()
        )
        files = [self.lake.abspath(f) for f in (man.quarantine_files if man else [])]
        if not files:
            empty = pa.table({"reason": pa.array([], type=pa.string())})
            return rd.from_arrow(empty)
        return rd.read_parquet(files, filesystem=self.lake.pyarrow_fs())

    def _post_merge(
        self,
        t0,
        timings,
        _lap,
        current,
        partitioner,
        meta_rows,
        pending,
        txn_id,
        snapshot_schema,
        watermarks,
        noop_report,
        quarantine: dict | None = None,
    ) -> dict:
        """Shared tail of an apply round (both exchange paths): salting
        decisions from merge metadata, watermark seeding, two-phase commit,
        report assembly, optional post-commit QA."""
        events_seen = sum(int(m["events_in"]) for m in meta_rows)
        if not meta_rows:
            return noop_report(events_seen)

        # ---- deferred salting: decide from the merge's heavy-hitter counts;
        # migrations execute on the NEXT apply via pending_migrations -------
        import json as _json

        domain_totals: dict[str, int] = {}
        for m in meta_rows:
            for d, n in _json.loads(m["top_domains"]).items():
                domain_totals[d] = domain_totals.get(d, 0) + int(n)
        if self.freeze_routing:
            # backlog mode: the scheduler's partition-disjointness was
            # computed under the CURRENT salt_map; deciding new salts here
            # would re-route urls mid-backlog (see __init__ docstring).
            # The observed counts flow back in the report so apply_backlog
            # can make the decision ONCE, after all waves complete.
            decisions = []
        else:
            decisions = partitioner.observe_domain_rows(domain_totals)
        pending_next = {d.domain: d.old_parts for d in decisions}

        # parts fully drained by THIS round's executed migrations
        migrated_empty = {
            p for old_parts in pending.values() for p in old_parts
        } - {int(m["part"]) for m in meta_rows}

        # ---- migration-target watermark seeding: a salt partition that
        # received only carried rows this round must inherit its source
        # partitions' watermark (those events are already folded into the
        # migrated state); otherwise it commits watermark_lsn=-1 and drags
        # min_watermark() down, forcing the next apply to re-read the whole
        # changelog history.
        wm_seed: dict[int, int] = {}
        for d, old_parts in pending.items():
            seed = max((watermarks.get(p, -1) for p in old_parts), default=-1)
            for tp in partitioner.salt_map.get(d, []):
                wm_seed[tp] = max(wm_seed.get(tp, -1), seed)

        # ---- phase 2: promote + commit (retry on version conflict) --------
        self.lake.promote_staged_files(txn_id)
        report = self._commit_with_retry(
            txn_id,
            snapshot_schema,
            partitioner,
            meta_rows,
            migrated_empty,
            pending_next,
            merge_base=current,
            wm_seed=wm_seed,
            timings=timings,
            quarantine=quarantine,
        )
        _lap("commit")
        if quarantine is not None:
            report["rows_quarantined"] = quarantine["rows"]
            report["quarantine"] = quarantine
        report.update(
            {
                "events_in": events_seen,
                "parts_changed": len(meta_rows),
                "salted_domains": [d.domain for d in decisions],
                "migrated_domains": sorted(pending.keys()),
                "timings": timings,
                "wall_s": time.time() - t0,
            }
        )
        if self.freeze_routing:
            report["domain_rows"] = domain_totals
        if self.cfg.run_qa:
            from radiant_portal_pipeline_ray.stages.qa import (
                cross_exclusive,
                generate_checks,
                run_checks,
                snapshot_checks,
            )

            man = self.lake.current_manifest()
            checks = snapshot_checks()
            have = {c.name for c in checks}
            # pattern-driven coverage of the committed schema: any *_frac /
            # *_count / *_id column added later is auto-checked (VERDICT #7)
            checks += [
                c for c in generate_checks(man.schema) if c.name not in have
            ]
            qa = run_checks(self.read_snapshot(), checks)
            files = [
                self.lake.abspath(f)
                for st in man.partitions.values()
                for f in st.files
            ]
            if files:
                # cross-table exclusivity (A8 analogue): a url must never be
                # both live and tombstoned in one committed snapshot
                pafs = self.lake.pyarrow_fs()
                live = rd.read_parquet(
                    files, columns=["url"], filter=~pc.field("deleted"),
                    filesystem=pafs,
                )
                tomb = rd.read_parquet(
                    files, columns=["url"], filter=pc.field("deleted"),
                    filesystem=pafs,
                )
                ce = cross_exclusive(live, tomb, "url")
                qa["checks"]["live_tombstone_exclusive"] = ce
                qa["passed"] = qa["passed"] and ce["ok"]
            report["qa"] = qa
        return report

    # ------------------------------------------------------------------
    def _commit_with_retry(
        self,
        txn_id: str,
        snapshot_schema: pa.Schema,
        partitioner: Partitioner,
        meta_rows: list[dict],
        migrated_empty: set[int],
        pending_next: dict[str, list[int]],
        merge_base: Manifest | None = None,
        wm_seed: dict[int, int] | None = None,
        timings: dict | None = None,
        quarantine: dict | None = None,
    ) -> dict:
        """Rebuild-manifest-and-retry loop; analogue of the reference's
        Iceberg commit retry (`radiant/tasks/iceberg/utils.py:73-96`).

        The rebuild is only valid while the merged partitions are unchanged
        in the new base: the staged files embed carried-forward rows and
        doc_id ranges computed from ``merge_base``. If a concurrent writer
        advanced any of them, raise ``ConcurrentWriterConflict`` instead of
        silently overwriting its rows (single-writer is the supported mode,
        same as the reference's one-committer-per-part fan-in,
        `radiant/dags/import_snv_vcf.py:47-49`)."""
        import json as _json

        wm_seed = wm_seed or {}
        attempt = 0
        merged_parts = {int(m["part"]) for m in meta_rows} | set(migrated_empty)
        while True:
            attempt += 1
            base = self.lake.current_manifest()
            base_v = base.version if base else None
            merge_v = merge_base.version if merge_base else None
            if base_v != merge_v:
                for p in merged_parts:
                    old = (
                        merge_base.partitions.get(p) if merge_base else None
                    ) or PartitionState()
                    new = (base.partitions.get(p) if base else None) or PartitionState()
                    if (old.files, old.watermark_lsn, old.next_doc_seq) != (
                        new.files,
                        new.watermark_lsn,
                        new.next_doc_seq,
                    ):
                        raise ConcurrentWriterConflict(
                            f"partition {p} advanced from v{merge_v} to v{base_v} "
                            f"during apply txn {txn_id}; re-run apply"
                        )
                # The rebuilt manifest republishes salt_map / pending
                # migrations / next_part derived from merge_base's
                # partitioner. If a concurrent writer changed routing state
                # (even on disjoint partitions), re-committing ours would
                # silently drop its salting decisions or double-allocate a
                # salt partition id — mis-routed rows. Refuse instead.
                # next_part=None (no manifest / pre-field manifest) routes
                # identically to next_part=n_parts — the partitioner's
                # starting counter — so coalesce before comparing, else an
                # empty-lake merge_base false-positives against a first
                # concurrent commit that published the default counter.
                old_route = (
                    (merge_base.salt_map, merge_base.pending_migrations,
                     merge_base.next_part
                     if merge_base.next_part is not None else self.cfg.n_parts)
                    if merge_base else ({}, {}, self.cfg.n_parts)
                )
                new_route = (
                    (base.salt_map, base.pending_migrations,
                     base.next_part
                     if base.next_part is not None else self.cfg.n_parts)
                    if base else ({}, {}, self.cfg.n_parts)
                )
                if old_route != new_route:
                    raise ConcurrentWriterConflict(
                        f"partitioner routing state (salt_map/pending_migrations/"
                        f"next_part) diverged between v{merge_v} and v{base_v} "
                        f"during apply txn {txn_id}; re-run apply"
                    )
            parts: dict[int, PartitionState] = (
                {p: st for p, st in base.partitions.items()} if base else {}
            )
            now = time.time()
            tot_up = tot_del = tot_car = tot_ev = 0
            for m in meta_rows:
                p = int(m["part"])
                old_st = parts.get(p)
                lineage = list(old_st.lineage) if old_st else []
                lineage.append(
                    {
                        "txn_id": txn_id,
                        "ts": now,
                        "events_in": int(m["events_in"]),
                        "rows_upserted": int(m["rows_upserted"]),
                        "rows_deleted": int(m["rows_deleted"]),
                        "rows_carried": int(m["rows_carried"]),
                        "max_lsn": int(m["max_lsn"]),
                    }
                )
                wm_old = old_st.watermark_lsn if old_st else -1
                parts[p] = PartitionState(
                    files=[f"data/part={p}/{fn}" for fn in m["files"]],
                    rows=int(m["rows"]),
                    tombstones=int(m["tombstones"]),
                    bytes=int(m["bytes"]),
                    watermark_lsn=max(
                        wm_old, int(m["max_lsn"]), wm_seed.get(p, -1)
                    ),
                    next_doc_seq=int(m["next_doc_seq"]),
                    lineage=lineage,
                    stats=_json.loads(m["file_stats"]),
                )
                tot_up += int(m["rows_upserted"])
                tot_del += int(m["rows_deleted"])
                tot_car += int(m["rows_carried"])
                tot_ev += int(m["events_in"])
            for p in migrated_empty:
                old_st = parts.get(p)
                if old_st:
                    lineage = list(old_st.lineage)
                    lineage.append({"txn_id": txn_id, "ts": now, "migrated_out": True})
                    parts[p] = PartitionState(
                        files=[],
                        rows=0,
                        bytes=0,
                        watermark_lsn=old_st.watermark_lsn,
                        next_doc_seq=old_st.next_doc_seq,
                        lineage=lineage,
                    )
            version = (base.version + 1) if base else 1
            manifest = Manifest(
                version=version,
                txn_id=txn_id,
                parent_version=base.version if base else None,
                schema=snapshot_schema,
                n_parts=self.cfg.n_parts,
                partitions=parts,
                salt_map=partitioner.salt_map,
                salt_hash_version=self._salt_v,
                salt_hash_fingerprint=self._salt_fp,
                pending_migrations=pending_next,
                next_part=partitioner.next_part,
                metrics={
                    "hot_counts": partitioner.hot_counts,
                    "last_apply": {
                        "events_in": tot_ev,
                        "rows_upserted": tot_up,
                        "rows_deleted": tot_del,
                        "rows_carried": tot_car,
                    },
                    # per-stage rows/bytes/time (T6 tracing parity,
                    # reference `radiant/tasks/tracing/trace.py:12-29`)
                    "stage_metrics": {
                        "normalize": {"events_in": tot_ev},
                        "merge": {
                            "rows_in": tot_ev + tot_car,
                            "rows_out": sum(int(m["rows"]) for m in meta_rows),
                            "tombstones": sum(
                                int(m["tombstones"]) for m in meta_rows
                            ),
                            "parts": len(meta_rows),
                        },
                        "write": {
                            "bytes": sum(int(m["bytes"]) for m in meta_rows),
                            "files": sum(len(m["files"]) for m in meta_rows),
                        },
                        "timings_s": dict(timings or {}),
                    },
                },
            )
            merged = dict(base.consumed_inputs) if base else {}
            merged.update(getattr(self, "_input_ledger", {}) or {})
            mw = manifest.min_watermark()
            manifest.consumed_inputs = (
                {k: v for k, v in merged.items() if v > mw}
                if mw >= 0
                else merged
            )
            manifest.quarantine_files = (
                list(base.quarantine_files) if base else []
            )
            if quarantine is not None:
                manifest.quarantine_files.append(quarantine["file"])
                manifest.metrics["last_apply"]["rows_quarantined"] = (
                    quarantine["rows"]
                )
                manifest.metrics["quarantine"] = quarantine
            try:
                committed = self.lake.commit(manifest)
                return {
                    "version": committed.version,
                    "txn_id": txn_id,
                    "rows_upserted": tot_up,
                    "rows_deleted": tot_del,
                    "rows_carried": tot_car,
                    "commit_attempts": attempt,
                }
            except CommitConflict:
                if attempt >= self.cfg.commit_retries:
                    raise
                time.sleep(min(0.05 * attempt, 1.0))

    # ------------------------------------------------------------------
    def read_snapshot(
        self,
        columns: list[str] | None = None,
        include_tombstones: bool = False,
        version: int | None = None,
        prune: dict | None = None,
    ) -> "rd.Dataset":
        """Committed state as a streaming Dataset (live rows only by
        default — retained delete tombstones are engine-internal).

        ``version`` time-travels to any RETAINED manifest version (the
        Iceberg-snapshot analogue, reference `radiant/tasks/iceberg`;
        retention is governed by ``gc(keep_versions=...)``). Raises
        ``FileNotFoundError`` for a pruned/unknown version.

        ``prune`` is an interval spec ``{col: (lo, hi)}`` over the
        zone-mapped columns (``url``/``warc_ts``/``lsn``, endpoints
        inclusive, either side None = open). Files whose manifest zone maps
        prove emptiness are skipped WITHOUT touching storage (pure driver
        math, ``state/zonemaps.py``); the exact interval filter is then
        pushed into the surviving files' scan, so the result equals an
        unpruned read + filter. Files lacking stats are read, never
        dropped."""
        man = (
            self.lake.read_manifest(version)
            if version is not None
            else self.lake.current_manifest()
        )
        if man:
            from radiant_portal_pipeline_ray.state.zonemaps import (
                plan_files,
                prune_expression,
            )

            rels, _ = plan_files(man, prune)
            files = [self.lake.abspath(f) for f in rels]
        else:
            files = []
        if not files:
            sch = man.schema if man and man.schema else CHANGELOG_SCHEMA
            empty = pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in sch], schema=sch
            )
            return rd.from_arrow(empty)
        filt = None if include_tombstones else ~pc.field("deleted")
        if prune:
            expr = prune_expression(prune)
            if expr is not None:
                filt = expr if filt is None else filt & expr
        return rd.read_parquet(
            files, columns=columns, filter=filt,
            filesystem=self.lake.pyarrow_fs(),
        )

    def read_changes(
        self, v_from: int, v_to: int, n_buckets: int = 64
    ) -> "rd.Dataset":
        """Change-data-feed between two retained versions: streaming
        ``(change_op I/U/D, url, lsn_from, lsn_to)``. Partitions whose file
        lists are identical at both versions are pruned from the read
        entirely (see ``pipelines/changefeed.py``)."""
        from radiant_portal_pipeline_ray.pipelines.changefeed import (
            read_changes,
        )

        return read_changes(self, v_from, v_to, n_buckets)

    def rollback(self, to_version: int) -> dict:
        """Publish a NEW manifest whose state is a verbatim copy of retained
        version ``to_version`` (Iceberg rollback analogue): partitions,
        watermarks, salt map, consumed-inputs ledger all revert, so change
        events the rolled-back versions had consumed re-apply on the next
        tail round — exactly the recover-from-bad-apply semantics. Data
        files are immutable and shared between versions, so rollback moves
        no data; it is one manifest commit. The bad versions stay readable
        for forensics until GC (or a tag) decides otherwise."""
        import json as _json

        current = self.lake.current_manifest()
        if current is None:
            raise FileNotFoundError("empty lake: nothing to roll back")
        if to_version == current.version:
            return {"version": current.version, "noop": True}
        old = self.lake.read_manifest(to_version)  # raises if pruned
        man = Manifest.from_json(_json.loads(_json.dumps(old.to_json())))
        man.version = current.version + 1
        man.parent_version = current.version
        man.txn_id = self.lake.new_txn_id()
        man.metrics = {"rollback_of": to_version}
        committed = self.lake.commit(man)
        return {
            "version": committed.version,
            "rolled_back_to": to_version,
            "noop": False,
        }

    def snapshot_checksums(self, version: int | None = None) -> pa.Table:
        """Per-partition anti-entropy checksums of the committed live state
        (order-independent wrap-around uint64 sum of a vectorized 64-bit
        content hash over url|lsn|text, plus row count). Two lakes hold identical live rows iff this table
        matches — the cheap replay-equality / replica-verification
        primitive: the result is one row per partition and no data row
        ever moves (per-batch partials are O(partitions))."""
        from radiant_portal_pipeline_ray.stages.qa import partition_checksums

        ds = self.read_snapshot(
            columns=["part", "url", "lsn", "text"], version=version
        )
        return partition_checksums(ds, "part", ["url", "lsn", "text"])

    def snapshot_checksums_incremental(
        self, prior_version: int, prior: pa.Table, version: int | None = None
    ) -> pa.Table:
        """``snapshot_checksums(version)`` computed O(changed): a partition
        whose manifest file list is IDENTICAL at both versions cannot differ
        (commits rewrite a partition's files whenever any of its rows
        change — the same invariant the change feed prunes on,
        ``pipelines/changefeed.py``), so its row from ``prior`` is reused
        verbatim and its data is never read. Only changed/new partitions
        re-scan. Equality with the full recompute is pinned in
        ``tests/test_snapshot_checksums.py``."""
        import ray.data as rd

        from radiant_portal_pipeline_ray.stages.qa import (
            partition_checksums,
            verify_checksum_fingerprint,
        )

        # refuse a prior built by a different hash implementation (polars
        # upgrade): reusing its rows next to fresh ones would produce a
        # table matching neither full recompute (ADVICE r4)
        hash_fn = verify_checksum_fingerprint(prior)
        man_from = self.lake.read_manifest(prior_version)
        man_to = (
            self.lake.read_manifest(version)
            if version is not None
            else self.lake.current_manifest()
        )
        from_files = {
            p: list(st.files) for p, st in man_from.partitions.items()
        }
        changed, kept = [], []
        for p, st in man_to.partitions.items():
            if from_files.get(p) == list(st.files):
                kept.append(p)
            else:
                changed.append(p)
        prior_kept = prior.filter(
            pc.is_in(prior.column("part"), value_set=pa.array(kept, pa.int64()))
        )
        files = [
            self.lake.abspath(f)
            for p in changed
            for f in man_to.partitions[p].files
        ]
        if not files:
            fresh = prior_kept.slice(0, 0)
        else:
            ds = rd.read_parquet(
                files,
                columns=["part", "url", "lsn", "text"],
                filter=~pc.field("deleted"),
                filesystem=self.lake.pyarrow_fs(),
            )
            fresh = partition_checksums(
                ds, "part", ["url", "lsn", "text"], hash_fn=hash_fn
            )
            # a changed partition can become empty (all rows tombstoned):
            # it then has files but zero live rows and no checksum row —
            # matching the full recompute, which also emits no row for it
        from radiant_portal_pipeline_ray.stages.qa import (
            stamp_checksum_fingerprint,
        )

        out = pa.concat_tables(
            [prior_kept.replace_schema_metadata(), fresh.replace_schema_metadata()]
        )
        out = out.take(
            pc.sort_indices(out, sort_keys=[("part", "ascending")])
        )
        # re-stamp so the result is itself reusable as next round's prior
        return stamp_checksum_fingerprint(out, hash_fn)

    def snapshot_table(
        self,
        columns: list[str] | None = None,
        include_tombstones: bool = False,
        version: int | None = None,
    ) -> pa.Table:
        """Driver-side pyarrow materialization — tests/small results only.
        ``version`` time-travels to a retained manifest (see read_snapshot)."""
        man = (
            self.lake.read_manifest(version)
            if version is not None
            else self.lake.current_manifest()
        )
        if not man or not any(st.files for st in man.partitions.values()):
            sch = man.schema if man and man.schema else CHANGELOG_SCHEMA
            return pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in sch], schema=sch
            )
        tables = []
        for st in man.partitions.values():
            for f in st.files:
                t = pq.read_table(
                    self.lake.abspath(f), columns=columns,
                    filesystem=self.lake.filesystem,
                )
                tables.append(t)
        out = pa.concat_tables(tables, promote_options="permissive")
        if not include_tombstones:
            if columns is None or "deleted" in (columns or []):
                out = out.filter(pc.equal(out.column("deleted"), False))
            else:
                mask = pa.concat_tables(
                    [
                        pq.read_table(
                            self.lake.abspath(f), columns=["deleted"],
                            filesystem=self.lake.filesystem,
                        )
                        for st in man.partitions.values()
                        for f in st.files
                    ]
                ).column("deleted")
                out = out.filter(pc.equal(mask.combine_chunks(), False))
        return out

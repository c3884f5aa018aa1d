"""Per-partition LWW merge + staged Parquet writer (``groupby(part).map_groups``).

One group = one partition's carried-forward snapshot rows (``op='S'``) plus
its fresh change events. The merge is fully vectorized and deterministic:

  sort by (url, warc_ts, lsn)  →  keep the last row per url (LWW)
  →  drop urls whose winner is a delete tombstone
  →  re-attach stable doc_ids (existing urls keep theirs; new urls get
     ``part << shift | seq`` allocated deterministically in url order from
     the partition's persisted counter)
  →  write url-sorted Parquet file(s) into ``_staging/<txn>/part=<P>/``
  →  return ONE small metadata row (files, counts, max lsn, lineage metrics)

Determinism matters: a retried Ray task re-executes the same group and
writes byte-identical files (same sort, same tie-breaks, same allocation
order), which is what makes the two-phase commit exactly-once under
retries (SURVEY §7.5 "Custom LWW semantics under retries").

Reference analogue: the rank-1 upsert shape
``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) = 1``
(`radiant/dags/sql/radiant/exomiser_insert_partition_delta.sql:9`), the
copy-partition carry-forward ``NOT IN delta AND NOT IN deleted``
(`radiant/dags/sql/radiant/germline_snv_occurrence_copy_partition.sql:1-3`)
and the AUTO_INCREMENT id dictionary
(`radiant/dags/sql/radiant/init/variant_lookup_create_table.sql:1-7`) —
collapsed into one per-partition vectorized kernel.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from radiant_portal_pipeline_ray.schemas import align_table

META_SCHEMA = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("files", pa.list_(pa.string())),
        pa.field("rows", pa.int64()),
        pa.field("tombstones", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("max_lsn", pa.int64()),
        pa.field("rows_upserted", pa.int64()),
        pa.field("rows_deleted", pa.int64()),
        pa.field("rows_carried", pa.int64()),
        pa.field("events_in", pa.int64()),
        pa.field("next_doc_seq", pa.int64()),
        #: JSON {domain: live_rows} for the partition's top domains — the
        #: driver's heavy-hitter feed for deferred salting decisions
        pa.field("top_domains", pa.string()),
        #: JSON list of per-file zone maps aligned with ``files``
        #: (state/zonemaps.py) — manifest-level data skipping at read time
        pa.field("file_stats", pa.string()),
    ]
)


class MergeKernel:
    """Shared per-partition LWW merge + staged-write kernel, used by BOTH
    exchange implementations (the Dataset ``groupby(part).map_groups`` sort
    path and the streaming actor exchange in stages/exchange.py)."""

    def __init__(
        self,
        txn_id: str,
        staging_dir: str,
        snapshot_schema: pa.Schema,
        next_doc_seq: dict[int, int],
        doc_id_part_shift: int,
        target_rows_per_file: int,
        compression: str,
        local_carry_files: dict[int, list[str]] | None = None,
        union_schema: pa.Schema | None = None,
        filesystem=None,
        fault_inject: tuple | None = None,
    ):
        self.txn_id = txn_id
        self.staging_dir = staging_dir
        self.snapshot_schema = snapshot_schema
        self.next_doc_seq = dict(next_doc_seq)
        self.doc_id_part_shift = doc_id_part_shift
        self.target_rows_per_file = target_rows_per_file
        self.compression = compression
        self.local_carry_files = dict(local_carry_files or {})
        self.union_schema = union_schema
        #: fsspec filesystem for an object-store lake (None = local paths).
        #: pyarrow wraps it natively in read_table/write_table; the kernel
        #: ships to merge tasks, so the fs must be picklable (LocalFileSystem
        #: and real object-store fs classes are; memory:// is driver-only).
        self.filesystem = filesystem
        #: tests only — ``("merge", dir)`` kills the first merge worker ONCE,
        #: after it has staged a partition's files (the partial-write case a
        #: retry must overwrite); see chaos.maybe_die_once.
        self.fault_inject = fault_inject

    def merge_partition(self, group: pa.Table, part: int) -> dict:
        """One partition's event rows (+ shuffled carried rows, if routing is
        changing) → url-sorted staged file(s) + one metadata dict."""
        carry = self.local_carry_files.get(part)
        if carry:
            # stable partition: carried-forward rows read LOCALLY from the
            # committed per-partition lake files — they never shuffled.
            # Threaded per-file reads: a partition that missed compaction can
            # carry many small files, and serial I/O inside this one merge
            # task would become the round's straggler. Per-file (not
            # multi-file-dataset) reads keep permissive schema promotion for
            # files written before a schema evolution.
            def _read(p):
                return pq.read_table(p, filesystem=self.filesystem)

            if len(carry) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(min(4, len(carry))) as ex:
                    tables = list(ex.map(_read, carry))
            else:
                tables = [_read(carry[0])]
            old = pa.concat_tables(tables, promote_options="permissive")
            old = align_table(old, self.union_schema or group.schema)
            n_old = old.num_rows
            old = old.set_column(
                old.schema.get_field_index("op"),
                pa.field("op", pa.string()),
                pa.array(["S"] * n_old, type=pa.string()),
            )
            old = old.set_column(
                old.schema.get_field_index("part"),
                pa.field("part", pa.int32()),
                pa.array(np.full(n_old, part, dtype=np.int32)),
            )
            group = pa.concat_tables(
                [align_table(group, old.schema), old]
            ).combine_chunks()

        # Copy discipline: the wide columns (html, text) are never taken for
        # the full sorted table. Only narrow key columns sort-materialize;
        # the single full-width copy is the winners-only take (~rows/keys of
        # the group, typically 30-50%). Byte-identical output to the naive
        # full-sort path — same sort, same tie-breaks.
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("url", "ascending"),
                ("warc_ts", "ascending"),
                ("lsn", "ascending"),
            ],
        )
        idx_np = idx.to_numpy(zero_copy_only=False)

        ops_all = group.column("op").to_numpy(zero_copy_only=False)
        is_state_all = ops_all == "S"
        events_in = int((~is_state_all).sum())
        lsn_all = group.column("lsn").to_numpy(zero_copy_only=False)
        ev_lsn = lsn_all[~is_state_all]
        max_lsn = int(ev_lsn.max()) if len(ev_lsn) else -1

        urls_sorted = pc.take(group.column("url"), idx)
        if isinstance(urls_sorted, pa.ChunkedArray):
            urls_sorted = urls_sorted.combine_chunks()
        urls = urls_sorted.to_numpy(zero_copy_only=False)
        n = len(urls)
        last = np.empty(n, dtype=bool)
        if n:
            last[:-1] = urls[:-1] != urls[1:]
            last[-1] = True
        winner_idx = idx_np[last]
        winners = group.take(pa.array(winner_idx)).combine_chunks()
        w_ops = ops_all[winner_idx]

        # tombstone semantics: a winning delete is RETAINED as a flagged row
        # so later out-of-order events lose to it (see schemas.INTERNAL_FIELDS)
        prev_deleted = (
            pc.fill_null(winners.column("deleted"), False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        deleted_flag = np.where(
            w_ops == "D", True, np.where(w_ops == "S", prev_deleted, False)
        )
        live = winners.set_column(
            winners.schema.get_field_index("deleted"),
            pa.field("deleted", pa.bool_()),
            pa.array(deleted_flag, type=pa.bool_()),
        )
        live_ops = w_ops

        # stable doc_id: existing urls keep theirs (url → doc_id from carried
        # state rows), new urls get deterministic sequential ids in url order.
        # Narrow (url, doc_id, deleted) projections of the state rows only —
        # never a full-width state copy.
        state_mask = pa.array(is_state_all)
        state_urls = group.column("url").filter(state_mask)
        if isinstance(state_urls, pa.ChunkedArray):
            state_urls = state_urls.combine_chunks()
        state_docs = group.column("doc_id").filter(state_mask)
        if isinstance(state_docs, pa.ChunkedArray):
            state_docs = state_docs.combine_chunks()
        doc = live.column("doc_id")
        if len(state_urls):
            lookup = pc.take(
                state_docs,
                pc.index_in(live.column("url"), value_set=state_urls),
            )
            doc = pc.coalesce(doc, lookup)
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        missing = pc.is_null(doc).to_numpy(zero_copy_only=False)
        doc_np = (
            pc.fill_null(doc, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        seq0 = int(self.next_doc_seq.get(part, 0))
        n_new = int(missing.sum())
        if n_new:
            base = np.int64(part) << np.int64(self.doc_id_part_shift)
            doc_np[missing] = base + seq0 + np.arange(n_new, dtype=np.int64)
        doc = pa.array(doc_np, type=pa.int64())
        live = live.set_column(
            live.schema.get_field_index("doc_id"), pa.field("doc_id", pa.int64()), doc
        )

        # lineage metrics
        live_mask = ~deleted_flag
        n_tombstones = int(deleted_flag.sum())
        rows_carried = int(((live_ops == "S") & live_mask).sum())
        rows_upserted = int(((live_ops == "I") | (live_ops == "U")).sum())
        state_deleted = group.column("deleted").filter(state_mask)
        if isinstance(state_deleted, pa.ChunkedArray):
            state_deleted = state_deleted.combine_chunks()
        old_live_urls = state_urls.filter(
            pc.equal(pc.fill_null(state_deleted, False), False)
        )
        del_winner_urls = winners.column("url").filter(pa.array(w_ops == "D"))
        if isinstance(del_winner_urls, pa.ChunkedArray):
            del_winner_urls = del_winner_urls.combine_chunks()
        hit = pc.index_in(del_winner_urls, value_set=old_live_urls)
        rows_deleted = int(pc.sum(pc.is_valid(hit)).as_py() or 0)

        # heavy-hitter domain counts (deferred-salting feed, top 16)
        import json as _json

        from radiant_portal_pipeline_ray.functions.hashing import extract_domain

        live_rows_mask = pa.array(live_mask)
        live_urls = live.filter(live_rows_mask).column("url")
        doms = extract_domain(live_urls)
        dom_counts = (
            pa.table({"d": doms})
            .group_by("d")
            .aggregate([("d", "count")])
            .rename_columns(["d", "n"])
        )
        dc_sorted = dom_counts.take(
            pc.sort_indices(
                dom_counts, sort_keys=[("n", "descending"), ("d", "ascending")]
            )
        ).slice(0, 16)
        top_domains = _json.dumps(
            dict(
                zip(dc_sorted.column("d").to_pylist(), dc_sorted.column("n").to_pylist())
            )
        )

        # project to the snapshot schema (drops op) and write staged files
        cols = [live.column(f.name).cast(f.type) for f in self.snapshot_schema]
        out = pa.Table.from_arrays(cols, schema=self.snapshot_schema)
        if self.filesystem is None:
            part_dir = os.path.join(self.staging_dir, f"part={part}")
            os.makedirs(part_dir, exist_ok=True)
        else:
            part_dir = f"{self.staging_dir}/part={part}"
            self.filesystem.makedirs(part_dir, exist_ok=True)
        from radiant_portal_pipeline_ray.state.zonemaps import file_stats

        files, total_bytes, stats = [], 0, []
        tpf = self.target_rows_per_file
        n_files = max(1, -(-out.num_rows // tpf)) if out.num_rows else 0
        for i in range(n_files):
            chunk = out.slice(i * tpf, tpf)
            fn = f"{self.txn_id}-{part}-{i:04d}.parquet"
            if self.filesystem is None:
                path = os.path.join(part_dir, fn)
                pq.write_table(chunk, path, compression=self.compression)
                total_bytes += os.path.getsize(path)
            else:
                path = f"{part_dir}/{fn}"
                pq.write_table(
                    chunk, path, compression=self.compression,
                    filesystem=self.filesystem,
                )
                total_bytes += int(self.filesystem.info(path)["size"])
            files.append(fn)
            stats.append(file_stats(chunk))

        if self.fault_inject is not None:
            # die AFTER staging this partition's files: the retried task
            # must overwrite the partial staged output (deterministic
            # txn/part/seq names), not duplicate it
            from radiant_portal_pipeline_ray.chaos import maybe_die_once

            maybe_die_once(self.fault_inject, "merge")

        return {
            "part": part,
            "files": files,
            "rows": out.num_rows - n_tombstones,
            "tombstones": n_tombstones,
            "bytes": total_bytes,
            "max_lsn": max_lsn,
            "rows_upserted": rows_upserted,
            "rows_deleted": rows_deleted,
            "rows_carried": rows_carried,
            "events_in": events_in,
            "next_doc_seq": seq0 + n_new,
            "top_domains": top_domains,
            "file_stats": _json.dumps(stats),
        }


def meta_dict_to_table(m: dict) -> pa.Table:
    return pa.Table.from_pydict({k: [m[k]] for k in META_SCHEMA.names}, schema=META_SCHEMA)


def make_merge_writer(
    txn_id: str,
    staging_dir: str,
    snapshot_schema: pa.Schema,
    next_doc_seq: dict[int, int],
    doc_id_part_shift: int,
    target_rows_per_file: int,
    compression: str,
    local_carry_files: dict[int, list[str]] | None = None,
    union_schema: pa.Schema | None = None,
    filesystem=None,
):
    """Dataset ``groupby(part).map_groups`` wrapper around MergeKernel (the
    sort-exchange path; stages/exchange.py is the streaming path)."""
    kernel = MergeKernel(
        txn_id,
        staging_dir,
        snapshot_schema,
        next_doc_seq,
        doc_id_part_shift,
        target_rows_per_file,
        compression,
        local_carry_files,
        union_schema,
        filesystem=filesystem,
    )

    def merge_group(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        part = group.column("part")[0].as_py()
        return meta_dict_to_table(kernel.merge_partition(group, part))

    return merge_group

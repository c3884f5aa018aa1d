"""Lake maintenance: partition compaction + tombstone purge.

A long-lived CDC lake accumulates (a) many small files per partition (one
per apply round that touched it) and (b) delete tombstones that only exist
to beat late out-of-order events. Both are rewritten here as a normal
exactly-once transaction: per-partition ``map_groups`` rewrite into staged
files → promote → manifest commit with a ``compacted`` lineage entry.
Watermarks, doc_id counters and the salt map are untouched, so an apply can
run before/after/interleaved with compaction and converge identically.

Reference analogue: the StarRocks temp-partition rewrite + ``REPLACE
PARTITION`` swap (`radiant/tasks/starrocks/operator.py:282-355`) and
Iceberg's rewrite-data-files maintenance, re-expressed as a Ray Data
groupby over the snapshot.

Tombstone retention: a tombstone for url U at (warc_ts, lsn) may be dropped
once no event ≤ the partition's committed watermark can still arrive —
i.e. purging below the watermark is safe under the engine's own delivery
contract (events are dropped at-or-below the watermark on ingest). The
caller opts in via ``purge_tombstones=True``.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.state.manifest import (
    Lake,
    Manifest,
    PartitionState,
)

_META = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("files", pa.list_(pa.string())),
        pa.field("rows", pa.int64()),
        pa.field("tombstones", pa.int64()),
        pa.field("bytes", pa.int64()),
    ]
)


def _make_rewriter(
    txn_id: str,
    staging_dir: str,
    schema: pa.Schema,
    target_rows_per_file: int,
    compression: str,
    purge_tombstones: bool,
):
    def rewrite(group: pa.Table) -> pa.Table:
        part = group.column("part")[0].as_py()
        t = group
        if purge_tombstones:
            t = t.filter(
                pc.equal(pc.fill_null(t.column("deleted"), False), False)
            )
        t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
        cols = [t.column(f.name).cast(f.type) for f in schema]
        out = pa.Table.from_arrays(cols, schema=schema)
        tomb = int(
            pc.sum(pc.fill_null(out.column("deleted"), False)).as_py() or 0
        )
        part_dir = os.path.join(staging_dir, f"part={part}")
        os.makedirs(part_dir, exist_ok=True)
        files, total = [], 0
        n_files = max(1, -(-out.num_rows // target_rows_per_file)) if out.num_rows else 0
        for i in range(n_files):
            chunk = out.slice(i * target_rows_per_file, target_rows_per_file)
            path = os.path.join(part_dir, f"{txn_id}-{part}-{i:04d}.parquet")
            pq.write_table(chunk, path, compression=compression)
            files.append(os.path.basename(path))
            total += os.path.getsize(path)
        return pa.Table.from_pydict(
            {
                "part": [part],
                "files": [files],
                "rows": [out.num_rows - tomb],
                "tombstones": [tomb],
                "bytes": [total],
            },
            schema=_META,
        )

    return rewrite


def compact(
    lake_root: str,
    config: EngineConfig | None = None,
    min_files: int = 2,
    purge_tombstones: bool = False,
) -> dict:
    """Rewrite every partition with ≥ ``min_files`` files (or any tombstones,
    when purging) into ``target_rows_per_file``-sized url-sorted files.

    Exactly-once like apply: staged under ``_staging/{txn}``, promoted, then
    committed via the manifest's put-if-absent. Returns a small report.
    """
    cfg = config or EngineConfig()
    lake = Lake(lake_root)
    current = lake.current_manifest()
    if current is None:
        return {"noop": True, "parts_compacted": 0}

    todo = {
        p: st
        for p, st in current.partitions.items()
        if st.files
        and (len(st.files) >= min_files or (purge_tombstones and st.tombstones))
    }
    if not todo:
        return {"noop": True, "parts_compacted": 0, "version": current.version}

    txn_id = lake.new_txn_id()
    staging = lake.staging_dir(txn_id)
    files = [lake.abspath(f) for st in todo.values() for f in st.files]
    rewriter = _make_rewriter(
        txn_id,
        staging,
        current.schema,
        cfg.target_rows_per_file,
        cfg.compression,
        purge_tombstones,
    )
    meta_rows = (
        rd.read_parquet(files)
        .groupby("part")
        .map_groups(rewriter, batch_format="pyarrow")
        .take_all()
    )
    lake.promote_staged_files(txn_id)

    now = time.time()
    parts = dict(current.partitions)
    for m in meta_rows:
        p = int(m["part"])
        old = parts[p]
        lineage = list(old.lineage)
        lineage.append(
            {
                "txn_id": txn_id,
                "ts": now,
                "compacted": True,
                "purged_tombstones": purge_tombstones,
                "files_before": len(old.files),
                "files_after": len(m["files"]),
            }
        )
        parts[p] = PartitionState(
            files=[f"data/part={p}/{fn}" for fn in m["files"]],
            rows=int(m["rows"]),
            tombstones=int(m["tombstones"]),
            bytes=int(m["bytes"]),
            watermark_lsn=old.watermark_lsn,
            next_doc_seq=old.next_doc_seq,
            lineage=lineage,
        )
    manifest = Manifest(
        version=current.version + 1,
        txn_id=txn_id,
        parent_version=current.version,
        schema=current.schema,
        partitions=parts,
        salt_map=current.salt_map,
        pending_migrations=current.pending_migrations,
        next_part=current.next_part,
        metrics=current.metrics,
    )
    committed = lake.commit(manifest)
    return {
        "noop": False,
        "version": committed.version,
        "txn_id": txn_id,
        "parts_compacted": len(meta_rows),
        "tombstones_purged": purge_tombstones,
    }

"""Copy-on-write Parquet lake: manifests, exactly-once two-phase commit, GC.

The lake layout (SURVEY §7.1):

    <root>/
      data/part=<P>/<txn>-<n>.parquet      # immutable, inert until referenced
      manifests/manifest-v<K>.json          # atomic snapshot pointer
      _staging/<txn>/part=<P>/...           # uncommitted writer output

A snapshot version is ONE manifest file listing, per partition: data files,
row/byte counts, watermark lsn, doc-id counter, and lineage records. Commit
is two-phase: (1) writers stage Parquet under ``_staging/<txn>``; (2) the
driver moves the files into ``data/`` and publishes
``manifest-v{K+1}.json`` via fsync + hard-link put-if-absent — the link
either atomically creates the version or fails with EEXIST, giving CAS
semantics without any catalog service. Retried commits are idempotent by
txn-id (a found manifest with our txn_id == success).

Reference analogue: Iceberg ``commit_files`` two-phase transaction with a
20-attempt backoff retry loop (`radiant/tasks/iceberg/utils.py:61-96`),
single-committer fan-in (`radiant/tasks/iceberg/utils.py:99-114`,
`radiant/dags/import_snv_vcf.py:47-49`) and the StarRocks temp-partition
atomic swap (`radiant/tasks/starrocks/operator.py:341-355`).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field as dc_field

import pyarrow as pa

from radiant_portal_pipeline_ray.schemas import (
    schema_from_b64,
    schema_summary,
    schema_to_b64,
)

_MANIFEST_RE = re.compile(r"^manifest-v(\d{12})\.json$")


class CommitConflict(Exception):
    """Another committer published this version first; rebuild and retry."""


@dataclass
class PartitionState:
    files: list[str] = dc_field(default_factory=list)  # relative to lake root
    rows: int = 0  # live rows (tombstones excluded)
    tombstones: int = 0
    bytes: int = 0
    watermark_lsn: int = -1
    next_doc_seq: int = 0
    lineage: list[dict] = dc_field(default_factory=list)

    def to_json(self) -> dict:
        return {
            "files": self.files,
            "rows": self.rows,
            "tombstones": self.tombstones,
            "bytes": self.bytes,
            "watermark_lsn": self.watermark_lsn,
            "next_doc_seq": self.next_doc_seq,
            "lineage": self.lineage,
        }

    @staticmethod
    def from_json(d: dict) -> "PartitionState":
        return PartitionState(
            files=list(d["files"]),
            rows=d["rows"],
            tombstones=d.get("tombstones", 0),
            bytes=d["bytes"],
            watermark_lsn=d["watermark_lsn"],
            next_doc_seq=d.get("next_doc_seq", 0),
            lineage=list(d.get("lineage", [])),
        )


@dataclass
class Manifest:
    version: int
    txn_id: str
    parent_version: int | None
    schema: pa.Schema | None
    #: size of the base hash-partition domain. min_watermark() must treat a
    #: base partition with NO committed state as watermark -1: the coarse
    #: changelog read filter ``lsn > min_watermark`` is only safe when every
    #: partition's events below the bound are truly committed — a
    #: yet-unseen partition may still receive arbitrarily old lsns (e.g. a
    #: priority-reordered backlog).
    n_parts: int = 0
    partitions: dict[int, PartitionState] = dc_field(default_factory=dict)
    salt_map: dict[str, list[int]] = dc_field(default_factory=dict)
    #: domains salted at THIS commit whose historical rows still live in
    #: their old partitions; the next apply must rewrite those partitions so
    #: rows follow the new routing (deferred migration — keeps salting
    #: decisions off the apply hot path).
    pending_migrations: dict[str, list[int]] = dc_field(default_factory=dict)
    next_part: int = 0
    committed_at: float = 0.0
    metrics: dict = dc_field(default_factory=dict)

    def watermarks(self) -> dict[int, int]:
        return {p: st.watermark_lsn for p, st in self.partitions.items()}

    def min_watermark(self) -> int:
        if not self.partitions:
            return -1
        if self.n_parts and any(
            p not in self.partitions for p in range(self.n_parts)
        ):
            return -1
        return min(st.watermark_lsn for st in self.partitions.values())

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "txn_id": self.txn_id,
            "parent_version": self.parent_version,
            "n_parts": self.n_parts,
            "schema_b64": schema_to_b64(self.schema) if self.schema else None,
            "schema": schema_summary(self.schema) if self.schema else [],
            "partitions": {str(p): st.to_json() for p, st in self.partitions.items()},
            "salt_map": self.salt_map,
            "pending_migrations": self.pending_migrations,
            "next_part": self.next_part,
            "committed_at": self.committed_at,
            "metrics": self.metrics,
        }

    @staticmethod
    def from_json(d: dict) -> "Manifest":
        return Manifest(
            version=d["version"],
            txn_id=d["txn_id"],
            parent_version=d.get("parent_version"),
            n_parts=d.get("n_parts", 0),
            schema=schema_from_b64(d["schema_b64"]) if d.get("schema_b64") else None,
            partitions={
                int(p): PartitionState.from_json(st)
                for p, st in d["partitions"].items()
            },
            salt_map={k: list(v) for k, v in d.get("salt_map", {}).items()},
            pending_migrations={
                k: list(v) for k, v in d.get("pending_migrations", {}).items()
            },
            next_part=d.get("next_part", 0),
            committed_at=d.get("committed_at", 0.0),
            metrics=d.get("metrics", {}),
        )


class Lake:
    """Filesystem-backed lake root with manifest CAS commit."""

    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "manifests")
        self.data_dir = os.path.join(root, "data")
        self.staging_root = os.path.join(root, "_staging")
        for d in (self.manifest_dir, self.data_dir, self.staging_root):
            os.makedirs(d, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def abspath(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def new_txn_id(self) -> str:
        return uuid.uuid4().hex[:16]

    def staging_dir(self, txn_id: str) -> str:
        d = os.path.join(self.staging_root, txn_id)
        os.makedirs(d, exist_ok=True)
        return d

    # -- manifest chain --------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-v{version:012d}.json")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def read_manifest(self, version: int) -> Manifest:
        with open(self._manifest_path(version)) as f:
            return Manifest.from_json(json.load(f))

    def current_manifest(self) -> Manifest | None:
        v = self.current_version()
        return self.read_manifest(v) if v is not None else None

    # -- phase 2: publish ------------------------------------------------
    def promote_staged_files(self, txn_id: str) -> dict[int, list[str]]:
        """Move ``_staging/<txn>/part=P/*.parquet`` into ``data/part=P/``.

        Returns {part: [relative final paths]}. Idempotent: a file already
        moved (crash between move and commit) is detected by its presence at
        the final path and simply re-referenced.
        """
        staged = self.staging_dir(txn_id)
        out: dict[int, list[str]] = {}
        for entry in sorted(os.listdir(staged)):
            if not entry.startswith("part="):
                continue
            part = int(entry.split("=", 1)[1])
            src_dir = os.path.join(staged, entry)
            dst_dir = os.path.join(self.data_dir, entry)
            os.makedirs(dst_dir, exist_ok=True)
            rels = []
            for fn in sorted(os.listdir(src_dir)):
                src = os.path.join(src_dir, fn)
                dst = os.path.join(dst_dir, fn)
                if not os.path.exists(dst):
                    os.replace(src, dst)
                rels.append(os.path.relpath(dst, self.root))
            out[part] = rels
        return out

    def commit(self, manifest: Manifest) -> Manifest:
        """Publish ``manifest`` as version ``manifest.version`` atomically.

        Hard-link put-if-absent: succeeds exactly once per version. If the
        version exists with our txn_id → idempotent success; with another
        txn_id → CommitConflict (caller rebuilds against the new current and
        retries — same loop shape as the reference's Iceberg retry,
        `radiant/tasks/iceberg/utils.py:73-96`).
        """
        manifest.committed_at = time.time()
        tmp = os.path.join(self.manifest_dir, f".tmp-{manifest.txn_id}-{manifest.version}.json")
        with open(tmp, "w") as f:
            # compact encoding: a wide lake's manifest is tens of thousands
            # of file entries and the dump is on the commit critical path
            json.dump(manifest.to_json(), f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        final = self._manifest_path(manifest.version)
        try:
            os.link(tmp, final)
        except FileExistsError:
            existing = self.read_manifest(manifest.version)
            if existing.txn_id == manifest.txn_id:
                os.remove(tmp)
                return existing
            os.remove(tmp)
            raise CommitConflict(
                f"version {manifest.version} committed by txn {existing.txn_id}"
            )
        os.remove(tmp)
        # cleanup staging dir for this txn — best-effort AND off the commit
        # critical path: with hundreds of salted part dirs the rmdir storm
        # costs ~1 s of round wall on this FS (measured), and gc_orphans
        # reclaims any leftover staging dir anyway.
        sd = os.path.join(self.staging_root, manifest.txn_id)
        if os.path.isdir(sd):
            import threading

            def _cleanup(path=sd):
                try:
                    for root_, _, files_ in os.walk(path, topdown=False):
                        for fn in files_:
                            os.remove(os.path.join(root_, fn))
                    for root_, dirs_, _ in os.walk(path, topdown=False):
                        for dd in dirs_:
                            os.rmdir(os.path.join(root_, dd))
                    os.rmdir(path)
                except OSError:
                    pass  # gc_orphans owns stragglers

            threading.Thread(target=_cleanup, daemon=True).start()
        return manifest

    # -- GC ---------------------------------------------------------------
    def gc_orphans(
        self, keep_versions: int = 2, staging_age_s: float = 3600.0
    ) -> list[str]:
        """Prune old manifests, delete unreferenced data files, and clear
        QUIESCED staging dirs.

        - Manifests older than the newest ``keep_versions`` are removed
          first (time-travel window); data files are then deleted when no
          surviving manifest references them.
        - A ``_staging/<txn>`` dir is removed only when its newest mtime is
          older than ``staging_age_s`` — an in-flight apply/compact keeps
          touching its staging dir, so a concurrent GC must not wipe files
          that a commit is about to promote.
        - The same quiescence age applies to unreferenced DATA files: an
          in-flight apply has a promote→commit window (commit retry can
          sleep) during which freshly promoted files are referenced by no
          manifest yet; deleting them would make the subsequent commit
          publish a manifest pointing at missing files.

        Safe after a crash mid-commit: staged/promoted-but-unreferenced files
        are inert; re-running apply regenerates them deterministically.
        """
        removed: list[str] = []
        now = time.time()
        vs = self.versions()
        for v in vs[:-keep_versions] if keep_versions > 0 else vs[:-1]:
            path = self._manifest_path(v)
            os.remove(path)
            removed.append(os.path.relpath(path, self.root))
        referenced: set[str] = set()
        for v in self.versions():
            man = self.read_manifest(v)
            for st in man.partitions.values():
                referenced.update(st.files)
        for entry in os.listdir(self.data_dir):
            pdir = os.path.join(self.data_dir, entry)
            if not os.path.isdir(pdir):
                continue
            for fn in os.listdir(pdir):
                path = os.path.join(pdir, fn)
                rel = os.path.relpath(path, self.root)
                if rel not in referenced:
                    # quiescence guard: a freshly promoted file may belong to
                    # an in-flight commit (promote→commit window); only
                    # delete once it is older than staging_age_s
                    if now - os.path.getmtime(path) < staging_age_s:
                        continue
                    os.remove(self.abspath(rel))
                    removed.append(rel)
        # staging: only txn dirs quiescent for > staging_age_s (an in-flight
        # writer's dir has a recent mtime somewhere under it)
        for txn in os.listdir(self.staging_root):
            sd = os.path.join(self.staging_root, txn)
            newest = os.path.getmtime(sd)
            for root_, _, files_ in os.walk(sd):
                for fn in files_:
                    newest = max(newest, os.path.getmtime(os.path.join(root_, fn)))
            if now - newest < staging_age_s:
                continue
            for root_, _, files_ in os.walk(sd, topdown=False):
                for fn in files_:
                    os.remove(os.path.join(root_, fn))
                    removed.append(os.path.relpath(os.path.join(root_, fn), self.root))
            for root_, dirs_, _ in os.walk(sd, topdown=False):
                for dd in dirs_:
                    os.rmdir(os.path.join(root_, dd))
            os.rmdir(sd)
        return removed

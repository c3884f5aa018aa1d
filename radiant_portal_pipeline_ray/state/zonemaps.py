"""Manifest zone maps: per-file column min/max recorded at WRITE time so a
snapshot read can prune files from the manifest alone — no parquet footer
round-trips at plan time. This is the Iceberg manifest-stats idea
(reference analogue: `radiant/tasks/iceberg` partition/file planning, plus
StarRocks zone-map indexes the serving tables get for free), re-expressed
for the JSON manifest.

At 100 TB a snapshot is ~10⁵–10⁶ files; opening every footer just to plan
a ``lsn > X`` or key-range read is itself a distributed job. A few dozen
bytes of stats per file in the manifest makes planning a pure driver-side
interval check.

String bounds are PREFIX-TRUNCATED (Iceberg's trick) to keep the manifest
small: a min truncates down (a prefix is ≤ the full string in code-point
order), a max must round UP — the last non-maximal code point of the
prefix is incremented and the tail dropped; if no such code point exists
the upper bound is recorded as unbounded (``None``).

Stats are strictly optional everywhere: files written before this feature
(or by writers that skip it) carry ``None`` and are simply never pruned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: string-bound prefix length (bytes of codepoints kept)
TRUNC = 32

_MAX_CP = 0x10FFFF

#: columns a snapshot file records bounds for, with their manifest encoding
STAT_COLUMNS = ("url", "warc_ts", "lsn")


def trunc_min(s: str, n: int = TRUNC) -> str:
    """Lower bound after truncation: a prefix sorts ≤ the full string."""
    return s[:n]


def trunc_max(s: str, n: int = TRUNC) -> str | None:
    """Upper bound after truncation: round the prefix UP, or ``None`` when
    no valid finite bound exists (all-maximal prefix)."""
    if len(s) <= n:
        return s
    p = s[:n]
    for i in range(len(p) - 1, -1, -1):
        cp = ord(p[i])
        if cp < _MAX_CP:
            return p[:i] + chr(cp + 1)
    return None


def _ts_us(v) -> int:
    """Normalize a timestamp scalar (pa scalar / datetime / np.datetime64 /
    int µs) to int µs since epoch."""
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, np.datetime64):
        return int(v.astype("datetime64[us]").astype(np.int64))
    if hasattr(v, "timestamp"):  # datetime
        return int(v.timestamp() * 1_000_000)
    raise TypeError(f"cannot normalize {type(v)} to µs")


def file_stats(t: pa.Table) -> dict | None:
    """Zone-map dict for one staged file's rows; ``None`` for empty files.

    ``{"url": [min_prefix, max_prefix|None], "warc_ts": [lo_us, hi_us],
    "lsn": [lo, hi]}`` — entries appear only for present, non-all-null
    columns."""
    if t.num_rows == 0:
        return None
    out: dict = {}
    names = set(t.schema.names)
    if "url" in names:
        mm = pc.min_max(t.column("url")).as_py()
        if mm["min"] is not None:
            out["url"] = [trunc_min(mm["min"]), trunc_max(mm["max"])]
    if "warc_ts" in names:
        mm = pc.min_max(t.column("warc_ts")).as_py()
        if mm["min"] is not None:
            out["warc_ts"] = [_ts_us(mm["min"]), _ts_us(mm["max"])]
    if "lsn" in names:
        mm = pc.min_max(t.column("lsn")).as_py()
        if mm["min"] is not None:
            out["lsn"] = [int(mm["min"]), int(mm["max"])]
    return out or None


def file_prunable(stats: dict | None, prune: dict) -> bool:
    """True iff the manifest stats PROVE the file has no row in the interval
    spec ``prune = {col: (lo, hi)}`` (either side may be ``None`` = open).
    Missing stats / columns / bounds always mean "keep". Interval endpoints
    are inclusive. ``warc_ts`` endpoints accept datetime / np.datetime64 /
    int µs."""
    if not stats:
        return False
    for col, (lo, hi) in prune.items():
        st = stats.get(col)
        if not st:
            continue
        smin, smax = st[0], st[1]
        if col == "warc_ts":
            lo = None if lo is None else _ts_us(lo)
            hi = None if hi is None else _ts_us(hi)
        # smax may be None (unbounded string max): no pruning on the lo side
        if lo is not None and smax is not None and smax < lo:
            return True
        if hi is not None and smin is not None and smin > hi:
            return True
    return False


def plan_files(manifest, prune: dict | None) -> tuple[list[str], int]:
    """Driver-side planning over a Manifest: relative paths of files that
    may hold rows in the interval spec, plus the count pruned. Pure
    manifest math — no parquet footers touched. Files without stats are
    always kept."""
    kept: list[str] = []
    pruned = 0
    for st in manifest.partitions.values():
        for i, f in enumerate(st.files):
            if prune and file_prunable(st.file_stats(i), prune):
                pruned += 1
            else:
                kept.append(f)
    return kept, pruned


def prune_expression(prune: dict):
    """Exact pyarrow filter expression matching the interval spec — pushed
    into the surviving files' scan so the result is exact, not merely a
    file-level superset."""
    expr = None
    for col, (lo, hi) in prune.items():
        if col == "warc_ts":
            lo = None if lo is None else np.datetime64(_ts_us(lo), "us")
            hi = None if hi is None else np.datetime64(_ts_us(hi), "us")
        for bound, op in ((lo, "ge"), (hi, "le")):
            if bound is None:
                continue
            e = (
                pc.field(col) >= pa.scalar(bound)
                if op == "ge"
                else pc.field(col) <= pa.scalar(bound)
            )
            expr = e if expr is None else expr & e
    return expr

"""Metadata-clean parquet reads.

Pandas-written parquet carries a ``b'pandas'`` schema-metadata key; a
``pa.Schema`` with schema-level metadata is unhashable in this pyarrow
version, which silently defeats Ray Data's block-schema deduplication in
every downstream shuffle ("Failed to hash the schemas (for deduplication)"
spam from reduce tasks + extra driver memory). Passing an explicit
metadata-free schema to ``read_parquet`` fixes it at the source with one
driver-side footer read.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def read_parquet_clean(
    paths: str | list[str], *, columns: list[str] | None = None, **kw
) -> "rd.Dataset":
    """``ray.data.read_parquet`` that strips schema-level metadata."""
    first = paths if isinstance(paths, str) else paths[0]
    probe = first
    if os.path.isdir(first):
        files = sorted(_glob.glob(os.path.join(first, "*.parquet")))
        probe = files[0] if files else None
    if probe is None:
        return rd.read_parquet(paths, columns=columns, **kw)
    sch = pq.read_schema(probe)
    if sch.metadata is None:
        return rd.read_parquet(paths, columns=columns, **kw)
    if columns is None:
        keep = list(sch)
    else:  # projected schema must list fields in `columns` order
        keep = [sch.field(c) for c in columns]
    clean = pa.schema([pa.field(f.name, f.type) for f in keep])
    return rd.read_parquet(paths, schema=clean, columns=columns, **kw)

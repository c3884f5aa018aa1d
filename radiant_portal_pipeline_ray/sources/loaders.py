"""File-load sources: CSV / NDJSON → Dataset with column mapping, computed
columns, row filter, and label-based idempotent publication.

Re-expresses the reference's StarRocks broker ``LOAD LABEL`` (S8 —
``radiant/dags/sql/radiant/staging_exomiser_load.sql:1-45``: TSV load with
column mapping, computed columns, ``WHERE contributing_variant=1`` filter,
label idempotence) and the raw NDJSON/CSV open-data loads (S10 —
``radiant/dags/import_open_data.py:84-109``) as Ray Data reads:

- ``read_csv_mapped`` / ``read_ndjson_mapped``: ``ray.data.read_csv`` /
  ``read_json`` (per-file read tasks — parallel like broker-load backends)
  followed by ONE vectorized ``map_batches`` doing rename → computed
  columns → filter, zero-copy Arrow throughout.
- ``idempotent_load``: the label semantics — if ``{lake}/loads/{label}`` was
  already published (``_SUCCESS`` marker), skip; else write Parquet under
  ``_staging/{label}`` and atomically rename into place. Re-running a load
  with the same label is a no-op, like re-submitting a finished LOAD LABEL.

At 100 TB the read fans out per file; the transform is stateless and
streams; the only serialization point is the final directory rename.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

import pyarrow as pa
import ray.data as rd


def _mapped(
    ds: rd.Dataset,
    rename: dict[str, str] | None,
    computed: dict[str, Callable[[pa.Table], pa.Array]] | None,
    where: Callable[[pa.Table], pa.Array] | None,
    select: list[str] | None,
) -> rd.Dataset:
    def transform(batch: pa.Table) -> pa.Table:
        if rename:
            batch = batch.rename_columns(
                [rename.get(c, c) for c in batch.column_names]
            )
        if computed:
            for name, fn in computed.items():
                batch = batch.append_column(name, fn(batch))
        if where is not None:
            batch = batch.filter(where(batch))
        if select:
            batch = batch.select(select)
        return batch

    return ds.map_batches(transform, batch_format="pyarrow")


def read_csv_mapped(
    paths: str | list[str],
    *,
    rename: dict[str, str] | None = None,
    computed: dict[str, Callable[[pa.Table], pa.Array]] | None = None,
    where: Callable[[pa.Table], pa.Array] | None = None,
    select: list[str] | None = None,
    **read_kwargs,
) -> rd.Dataset:
    """CSV/TSV load with column mapping + computed columns + filter (S8)."""
    return _mapped(rd.read_csv(paths, **read_kwargs), rename, computed, where, select)


def read_ndjson_mapped(
    paths: str | list[str],
    *,
    rename: dict[str, str] | None = None,
    computed: dict[str, Callable[[pa.Table], pa.Array]] | None = None,
    where: Callable[[pa.Table], pa.Array] | None = None,
    select: list[str] | None = None,
    **read_kwargs,
) -> rd.Dataset:
    """NDJSON load (S10, ClinVar-RCV-shaped raw loads)."""
    return _mapped(rd.read_json(paths, **read_kwargs), rename, computed, where, select)


def idempotent_load(ds: rd.Dataset, lake_root: str, label: str) -> dict:
    """Publish ``ds`` as Parquet under ``{lake_root}/loads/{label}`` exactly
    once. Returns ``{"label", "skipped", "path"}``.

    Label semantics per the reference's broker load: a finished label is
    never re-ingested (``staging_exomiser_load.sql:1`` LOAD LABEL; poll loop
    ``radiant/tasks/starrocks/operator.py:465-481``). Here "finished" is a
    ``_SUCCESS`` marker written only after a staging → final atomic rename.
    """
    final = os.path.join(lake_root, "loads", label)
    marker = os.path.join(final, "_SUCCESS")
    if os.path.exists(marker):
        return {"label": label, "skipped": True, "path": final}
    staging = os.path.join(lake_root, "_staging", f"load-{label}")
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    ds.write_parquet(staging)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(staging, final)
    with open(marker, "w") as f:
        f.write("ok")
    return {"label": label, "skipped": False, "path": final}

"""WAL/binlog tail loop: continuous micro-batch ingest of a changelog
directory (the north-star's "tails a binlog/WAL-style change stream";
reference analogue: the Airflow-scheduled periodic import run,
`radiant/dags/import_radiant.py:48-210`, re-expressed as a driver loop over
the exactly-once apply).

Each poll is **O(new files)**, not O(directory history):

- The manifest carries a ``consumed_inputs`` ledger (input basename →
  max lsn) recorded ATOMICALLY with the commit that consumed it — file
  consumption inherits the lake's exactly-once CAS, no side-channel state.
- The ledger is bounded: commits prune entries whose ``max_lsn`` is at or
  below the lake's min watermark, because such a file is PROVABLY a no-op
  to re-apply (every partition's watermark drops all of its events). The
  tail re-derives that proof for pruned/unknown files from the parquet
  FOOTER alone (row-group lsn statistics — no data pages read).
- A file that is neither in the ledger nor footer-provable is applied;
  if a crash happened after its commit but the ledger write raced, the
  re-apply is still a no-op by the LWW watermark (idempotence is the
  engine's, the ledger is the fast path).

Crash-resume therefore needs no recovery step: restart the loop and it
continues from the committed state.
"""

from __future__ import annotations

import glob
import logging
import os
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq

logger = logging.getLogger(__name__)


def input_max_lsn(path: str) -> int:
    """Max lsn of a changelog file from row-group statistics (footer-only);
    falls back to a single-column read when stats are absent."""
    try:
        md = pq.ParquetFile(path).metadata
        if md.num_row_groups > 0:
            idx = -1
            for i in range(md.num_columns):
                if md.row_group(0).column(i).path_in_schema == "lsn":
                    idx = i
                    break
            if idx >= 0:
                mx = None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        mx = None
                        break
                    mx = int(st.max) if mx is None else max(mx, int(st.max))
                if mx is not None:
                    return mx
        col = pq.read_table(path, columns=["lsn"]).column("lsn")
        v = pc.max(col).as_py()
        return int(v) if v is not None else -1
    except Exception:  # unreadable footer → never skippable, never prunable
        return 1 << 62


def pending_inputs(engine, changelog_dir: str) -> list[str]:
    """Changelog files not yet provably consumed, in name order (the
    generator emits lsn-ordered batch files, so name order is lsn order)."""
    man = engine.lake.current_manifest()
    ledger = man.consumed_inputs if man else {}
    min_wm = man.min_watermark() if man else -1
    out = []
    for path in sorted(glob.glob(os.path.join(changelog_dir, "*.parquet"))):
        base = os.path.basename(path)
        if base in ledger:
            continue
        if min_wm >= 0 and input_max_lsn(path) <= min_wm:
            continue  # footer-provable no-op (pruned ledger entry)
        out.append(path)
    return out


def tail(
    engine,
    changelog_dir: str,
    poll_s: float = 2.0,
    max_rounds: int | None = None,
    idle_exit: int | None = None,
    batch_files: int | None = None,
    on_report=None,
    sig_index=None,
) -> list[dict]:
    """Poll ``changelog_dir`` and apply new files as they appear.

    - ``max_rounds``: stop after this many apply rounds (None = unbounded).
    - ``idle_exit``: stop after this many consecutive empty polls (None =
      poll forever; set for tests/drain runs).
    - ``batch_files``: cap files per apply round (micro-batch sizing; a
      round's delta must fit the cluster's object-store budget —
      BASELINE.md large-scale note).
    - ``sig_index``: a ``SignatureIndex`` to maintain continuously — built
      from the first committed version, then probed+updated per commit
      (``ingest_round``), so near-duplicates of every incoming document are
      detected AT INGEST TIME in O(changed); each round's pairs persist to
      ``<index root>/pairs/v{version}.parquet`` and the report carries
      ``neardup_pairs``.
    Returns the apply reports in execution order.
    """
    import pyarrow.parquet as _pq
    import ray as _ray

    reports: list[dict] = []
    rounds = 0
    idle = 0
    while True:
        new = pending_inputs(engine, changelog_dir)
        if batch_files and len(new) > batch_files:
            new = new[:batch_files]
        if new:
            idle = 0
            v_prev = engine.lake.current_version()
            rep = engine.apply(new)
            rep["consumed_files"] = [os.path.basename(p) for p in new]
            v_new = rep.get("version")
            if sig_index is not None and v_new is not None:
                if sig_index.version is None:
                    sig_index.build(engine, v_new)
                    rep["sig_index"] = {"built_at": v_new}
                elif v_prev is not None and v_new != v_prev:
                    if sig_index.version != v_prev:
                        raise ValueError(
                            f"signature index at version {sig_index.version} "
                            f"cannot follow lake {v_prev}->{v_new}; rebuild it"
                        )
                    pairs, stats = sig_index.ingest_round(engine, v_prev, v_new)
                    tabs = [
                        t
                        for t in _ray.get(pairs.materialize().to_arrow_refs())
                        if t.num_rows
                    ]
                    n_pairs = sum(t.num_rows for t in tabs)
                    if tabs:
                        import pyarrow as _pa

                        pdir = os.path.join(sig_index.root, "pairs")
                        os.makedirs(pdir, exist_ok=True)
                        _pq.write_table(
                            _pa.concat_tables(tabs, promote_options="permissive"),
                            os.path.join(pdir, f"v{v_new:06d}.parquet"),
                            compression="zstd",
                        )
                    rep["neardup_pairs"] = n_pairs
                    rep["sig_index"] = stats
            reports.append(rep)
            if on_report is not None:
                on_report(rep)
            rounds += 1
            if max_rounds is not None and rounds >= max_rounds:
                break
            continue  # drain the backlog before sleeping
        idle += 1
        if idle_exit is not None and idle >= idle_exit:
            break
        time.sleep(poll_s)
    return reports

"""Engine configuration.

Reference analogue: resource profiles + partition capacity knobs
(`radiant/dags/operators/k8s.py:9-31`, `radiant/tasks/starrocks/partition.py:91-94`,
`radiant/tasks/iceberg/table_accumulator.py:16-19`) — collapsed into one dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    """Knobs for the CDC apply pipeline.

    Defaults are sized for single-node tests; at cluster scale raise
    ``n_parts`` so each partition's merge group fits one worker's heap
    (the explicit design assumption of the per-partition merge, SURVEY §7.5).
    """

    # --- partitioning ---------------------------------------------------
    #: number of base hash partitions (part = stable_hash(domain) % n_parts).
    n_parts: int = 8
    #: a domain whose cumulative row count exceeds this is salted across
    #: multiple partitions (hot-key handling, north rule axes A+B).
    #: url→salt-slot hash for a NEW lake: 2 = vectorized polars/xxhash
    #: (default), 1 = legacy per-row CRC-32. An EXISTING lake always keeps
    #: the version its manifest records — this knob only seeds empty lakes
    #: (fleet-compat pin).
    salt_hash_version_default: int = 2
    salt_threshold_rows: int = 250_000
    #: target rows per salted sub-partition when splitting a hot domain.
    salt_target_rows: int = 150_000
    #: growth factor for one-shot salting: allocate enough salt partitions
    #: for ``salt_headroom``× the observed volume so a growing hot domain
    #: migrates once, not once per doubling (state/partitioner.py).
    salt_headroom: float = 4.0

    # --- merge / write --------------------------------------------------
    #: split a partition's snapshot into multiple files above this row count
    #: (resumable, scan-parallel output; reference flushed at 500MB —
    #: `radiant/tasks/iceberg/table_accumulator.py:16`).
    target_rows_per_file: int = 1_000_000
    #: parquet compression for snapshot files.
    compression: str = "zstd"

    # --- commit ---------------------------------------------------------
    #: manifest commit retry budget (reference: 20 attempts w/ backoff,
    #: `radiant/tasks/iceberg/utils.py:73-96`).
    commit_retries: int = 20

    # --- doc-id allocation ----------------------------------------------
    #: the apply pipeline allocates doc_ids deterministically inside the
    #: merge from per-partition counters persisted in the manifest (no
    #: coordination — ids are ``part << doc_id_part_shift | seq``). The
    #: per-partition hash-index actor pool (state/id_index.py) is the
    #: alternative for pipelines whose keyed state must outlive a shuffle.
    doc_id_part_shift: int = 40

    # --- exchange -------------------------------------------------------
    #: how event rows reach their partition's merge task:
    #: - "task": fused read+normalize+split tasks → per-bucket merge tasks
    #:   (stages/taskshuffle.py) — the delta hits the object store exactly
    #:   once, no sort, no boundary sampling; per-task lineage retries.
    #: - "sort": Ray Data ``groupby(part).map_groups`` sort shuffle —
    #:   per-task retries, but the delta transits plasma ~3× (materialize →
    #:   sort slices → reduce concat) and normalize must fully materialize
    #:   before the sort samples boundaries (an idle barrier per round).
    #: - "actor": streaming shard-actor exchange (stages/exchange.py) —
    #:   normalize overlaps the exchange, no barrier; at-least-once pushes
    #:   (safe: LWW merge is idempotent to duplicate delivery), whole-round
    #:   restart on shard-actor loss. For deployments where the exchange
    #:   crosses a network and push-streaming beats plasma staging.
    #: Default "task": minimal memory traffic — measured ~2× faster per
    #: round than "sort" at 32 CPUs AND it stops the sort's page-fault storm
    #: from poisoning the next round's reads (BASELINE.md round-3 notes).
    exchange: str = "task"

    # --- ray data knobs -------------------------------------------------
    #: batch size for normalize map_batches; html payloads are ~KB so this
    #: keeps batches in the tens-of-MB range.
    normalize_batch_size: int = 8192
    #: blocks for the changelog/snapshot reads feeding the apply. ``None``
    #: derives 2 × cluster CPUs at apply time. Without this, a round that
    #: tails a couple of changelog files gets a couple of read tasks and the
    #: CPU-heavy normalize stage runs at parallelism ≈ n_files — it can't
    #: use the cluster. Splitting happens at parquet row-group granularity.
    read_parallelism: int | None = None
    #: probe changed partitions from a column-pruned (url, lsn) read instead
    #: of materializing the normalized delta. Use when the tail is mostly
    #: pre-watermark (resume from a long backlog); the default eager
    #: materialization is faster when most events are fresh.
    sparse_scout: bool = False

    # --- maintenance ----------------------------------------------------
    #: event-time horizon for tombstone purge: a delete tombstone may be
    #: dropped only when its warc_ts is older than (max observed warc_ts −
    #: this lag). LWW order is (warc_ts, lsn), so a late out-of-order event
    #: carries a NEW lsn (passes the watermark filter) but an OLD warc_ts;
    #: without its tombstone such an event would resurrect a deleted url.
    #: Must exceed the source's out-of-order jitter bound (FIXTURES:
    #: ts_jitter_s = 86400); default keeps a 7-day margin.
    tombstone_horizon_lag_s: int = 7 * 86400

    #: run the post-commit QA suite (stages/qa.snapshot_checks) at the end
    #: of every successful ``CdcEngine.apply``; the report is returned under
    #: ``report['qa']`` and failures are data, not exceptions.
    run_qa: bool = False

    # --- chaos (tests only) ----------------------------------------------
    #: worker-crash injection point:
    #: ``("scout"|"merge"|"compact", sentinel_dir)``.
    #: The first matching task after the sentinel dir is empty hard-exits
    #: its worker process (a REAL worker death — Ray's task retry, the
    #: deterministic staged-file names and the manifest CAS must absorb it).
    #: See chaos.py and tests/test_chaos.py. Always ``None`` in production;
    #: wired on the default task exchange.
    fault_inject: tuple | None = None

    extra: dict = field(default_factory=dict)

"""Benchmark harness (driver contract, BASELINE.md target).

Headline: CDC apply throughput — replay a deterministic synthetic webtext
changelog (FIXTURES.md bench tier, scaled to $GRAFT_SF_DIR) through the full
engine in incremental rounds, measuring end-to-end apply wall time
(normalize → route → LWW merge → exactly-once commit). Secondary: wall time
of representative operator pipelines over the sf tables.

Prints ONE JSON line on stdout:
  {"metric": "cdc_replay_sec", "value": <sec>, "unit": "sec",
   "events_per_sec": ..., "queries": {...}, "sf": ..., "num_cpus": N}

--scaling: run the same input in two fresh processes at num_cpus=2 and 8
(N and 4N; override GRAFT_SCALING_LO/HI) and report throughput at both +
scaling efficiency (two-cluster-size stand-in; this sandbox has no
multi-node cluster — 2→8 stays inside the host's memory-bandwidth
envelope, see BASELINE.md).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _bench_spec(sf_dir: str):
    """Scale the changelog to the sf tier: ~10/3 events per lineitem row
    (600k rows at sf0.1 → 2M events, FIXTURES.md bench tier).
    ``GRAFT_BENCH_EVENTS`` overrides the event count directly — the
    larger-than-sf0.1 validation runs (BASELINE.md §Large-scale replay) use
    it to push the exchange's byte-scaled bucket sizing past the regime the
    sf tiers reach."""
    import pyarrow.parquet as pq

    from radiant_portal_pipeline_ray.sources.generator import ChangelogSpec

    ev_env = os.environ.get("GRAFT_BENCH_EVENTS")
    if ev_env:
        n_events = int(ev_env)
    else:
        li_rows = pq.ParquetFile(
            os.path.join(sf_dir, "lineitem.parquet")
        ).metadata.num_rows
        n_events = max(20_000, int(li_rows * 10 / 3))
    return ChangelogSpec(
        n_urls=max(2_000, n_events // 10),
        n_events=n_events,
        n_domains=max(50, n_events // 4_000),
        # many small files per round: a real binlog tail is thousands of
        # files, so per-round read parallelism = files, not 1-2 big blobs
        n_batches=64,
        seed=42,
        # Common-Crawl-ish page sizes (~3KB html): per-event extract/merge
        # compute and shuffle bytes dominate task overhead, as at 10^10 scale
        html_repeat=16,
    )


def _ensure_changelog(spec) -> list[str]:
    """Generate once, cache under /tmp keyed by the spec (generation is
    untimed; it also warms the page cache for the timed read)."""
    from radiant_portal_pipeline_ray.sources.generator import generate_changelog

    key = hashlib.sha256(repr(spec).encode()).hexdigest()[:16]
    root = f"/tmp/graft_bench/changelog-{key}"
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".parquet")
        )
    shutil.rmtree(root, ignore_errors=True)
    paths = generate_changelog(root, spec)
    with open(done, "w") as f:
        f.write("ok")
    return paths


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=_num_cpus(),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from radiant_portal_pipeline_ray.config import EngineConfig
    from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine

    sf_dir = _sf_dir()
    spec = _bench_spec(sf_dir)
    paths = _ensure_changelog(spec)
    # warm page cache (untimed)
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass

    def one_replay() -> tuple[float, list, list]:
        # pid-unique scratch lake: concurrent bench processes (e.g. a
        # scaling campaign leg + a smoke run) must never rmtree each
        # other's lake
        lake = f"/tmp/graft_bench/lake-{_num_cpus()}-{os.getpid()}"
        shutil.rmtree(lake, ignore_errors=True)
        # n_parts is FIXED across parallelism levels (a real table's layout
        # does not change with cluster size); 64 parts ≈ 2 merge groups per
        # CPU at the high level, enough slack that one part never gates the
        # round
        eng = CdcEngine(
            lake,
            EngineConfig(
                n_parts=64,
                # salt hot domains at bench scale so the zipf-head partition
                # can't become a merge straggler (north rule axes A+B)
                salt_threshold_rows=10_000,
                salt_target_rows=5_000,
            ),
        )
        t0 = time.time()
        rounds, round_timings = [], []
        # 2 incremental rounds of ~1M events: bigger rounds amortize the
        # per-round barriers (plan + materialize + sort sampling + commit)
        # while still exercising incremental watermarks, carried-forward
        # merge and salting migration across rounds. GRAFT_BENCH_ROUNDS
        # overrides: the >10M-event validation runs use more, sf0.1-sized
        # rounds so one round's materialized delta (events x ~3KB html)
        # stays inside this sandbox's object-store + spill-disk budget —
        # on a real cluster each node brings its own spill disk, but here
        # a single 10M-event round spills ~45GB into one /tmp.
        n_rounds = int(os.environ.get("GRAFT_BENCH_ROUNDS", "2"))
        step = max(1, len(paths) // max(1, n_rounds))
        for i in range(0, len(paths), step):
            r = eng.apply(paths[i : i + step])
            rounds.append(round(r["wall_s"], 3))
            round_timings.append(r.get("timings", {}))
        sec = time.time() - t0
        shutil.rmtree(lake, ignore_errors=True)
        return sec, rounds, round_timings

    # best-of-N fresh replays (same session): identical runs on this
    # co-tenant VM have measured 2-4x apart under noise storms (BASELINE.md
    # variance bracket); the min is the capability number. All runs are
    # reported in replay_runs_sec.
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    replay_runs = [one_replay() for _ in range(max(1, repeats))]
    replay_sec, rounds, round_timings = min(replay_runs, key=lambda r: r[0])
    events_per_sec = spec.n_events / replay_sec

    # secondary operator pipelines over the sf tables
    from radiant_portal_pipeline_ray.pipelines import (
        dedup,
        relational,
        similarity,
        textops,
    )

    if os.environ.get("GRAFT_SKIP_QUERIES"):
        out = {
            "metric": "cdc_replay_sec",
            "value": round(replay_sec, 3),
            "unit": "sec",
            "events_per_sec": round(events_per_sec, 1),
            "n_events": spec.n_events,
            "apply_rounds_sec": rounds,
            "round_timings": round_timings,
            "queries": {},
            "sf": sf_dir,
            "replay_runs_sec": [round(r[0], 3) for r in replay_runs],
            "aggregation": f"min-of-{len(replay_runs)}",
            "num_cpus": _num_cpus(),
        }
        ray.shutdown()
        return out

    bench_queries = {
        "q1_pricing_summary": relational.QUERIES["q1_pricing_summary"][0],
        "q_region_revenue": relational.QUERIES["q_region_revenue"][0],
        "q_shipped_within_60d": relational.QUERIES["q_shipped_within_60d"][0],
        "q_latest_order_per_customer": relational.QUERIES[
            "q_latest_order_per_customer"
        ][0],
        "q_hourly_user_activity": relational.QUERIES["q_hourly_user_activity"][0],
        "dd_minhash_lsh": dedup.QUERIES["dd_minhash_lsh"][0],
        "dd_exact": dedup.QUERIES["dd_exact"][0],
        "t_quality_scores": textops.QUERIES["t_quality_scores"][0],
        "sim_topk_cosine": similarity.QUERIES["sim_topk_cosine"][0],
        # round-4 additions: window-function and two-pass heavy-hitter shapes
        "q_running_total": relational.QUERIES["q_running_total"][0],
        "q_heavy_hitter_tokens": relational.QUERIES["q_heavy_hitter_tokens"][0],
    }
    # best-of-N per query: co-tenant noise bursts on this VM inflate a
    # single run by 2-5x (BASELINE.md variance bracket); min is the
    # capability number
    q_reps = int(os.environ.get("GRAFT_QUERY_REPEATS", "2"))
    qtimes = {}
    for name, fn in bench_queries.items():
        best = float("inf")
        for _ in range(max(1, q_reps)):
            tq = time.time()
            res = fn(sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            best = min(best, time.time() - tq)
        qtimes[name] = round(best, 3)

    out = {
        "metric": "cdc_replay_sec",
        "value": round(replay_sec, 3),
        "unit": "sec",
        "events_per_sec": round(events_per_sec, 1),
        "n_events": spec.n_events,
        "apply_rounds_sec": rounds,
        "round_timings": round_timings,
        "queries": qtimes,
        "sf": sf_dir,
        "replay_runs_sec": [round(r[0], 3) for r in replay_runs],
        # "value" and each queries[...] entry are the MIN over repeats (see
        # replay_runs_sec for all runs) — older baselines before r3 were
        # single-run; compare accordingly
        "aggregation": f"min-of-{len(replay_runs)}",
        "query_aggregation": f"min-of-{max(1, q_reps)}",
        "num_cpus": _num_cpus(),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run_once(ncpu: int) -> dict:
        # replay only — the secondary query suite is not part of the scaling
        # metric and would just add load/noise between legs
        env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        GRAFT_SKIP_QUERIES="1",
        # scaling legs repeat at the CAMPAIGN level; one replay per leg
        GRAFT_BENCH_REPEATS="1",
    )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best-of-N fresh processes: single-node VM timings are noisy
        # (±2x under residual load); min is the honest capability number
        reps = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
        results = [run_once(ncpu) for _ in range(reps)]
        return min(results, key=lambda r: r["value"])

    # Default pair 2→8: the N→4N cluster-size stand-in INSIDE this VM's
    # memory-bandwidth envelope (the 8→32 pair saturates the DRAM bus —
    # pure-compute microbench: per-core extract_text throughput halves at
    # 32 procs, capping even a zero-coordination workload at ~0.51; a real
    # 4x-node cluster brings 4x aggregate bandwidth). Override with
    # GRAFT_SCALING_LO/HI. See BASELINE.md for the campaign protocol.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "8"))
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "events_per_sec_lo": r_lo["events_per_sec"],
        "events_per_sec_hi": r_hi["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

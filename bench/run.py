"""`ray job submit`-able benchmark entry point (BASELINE.md target).

Usage:
    ray job submit --working-dir . -- python bench/run.py
    python bench/run.py [--scaling]

On a real cluster, submit with `ray job submit` against the cluster address;
in this sandbox it runs local mode. Owns its Ray session (guarded init);
delegates to the repo-root ``bench.py`` harness so the driver-run bench and
the job-submit bench measure the identical pipeline.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps(bench.run_scaling()))
        return
    import ray

    out = bench.run_bench()
    print(json.dumps(out))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()

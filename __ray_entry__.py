"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in the library)
initialises or shuts down Ray.

- ``entry()`` — flagship CDC replay over /root/testdata/sf0.001: derive a
  deterministic webtext changelog from the documents table, run the full
  engine (normalize → partition route → LWW merge → exactly-once commit),
  return the committed snapshot Dataset.
- ``queries()`` — one callable per implemented operator (SURVEY.md §2 +
  training-data ops); each takes ``sf_dir``.
- ``oracle_sql()`` — matching DuckDB SQL with identical column names.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    from radiant_portal_pipeline_ray.pipelines.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    from radiant_portal_pipeline_ray.pipelines import relational

    reg: dict[str, tuple] = {}
    reg.update(relational.QUERIES)
    try:
        from radiant_portal_pipeline_ray.pipelines import textops

        reg.update(textops.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import dedup

        reg.update(dedup.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import similarity

        reg.update(similarity.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import sourceload

        reg.update(sourceload.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import multimodal_q

        reg.update(multimodal_q.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import flagship

        reg.update(flagship.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import changefeed

        reg.update(changefeed.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import sketches

        reg.update(sketches.QUERIES)
    except ImportError:
        pass
    try:
        from radiant_portal_pipeline_ray.pipelines import incremental_dedup

        reg.update(incremental_dedup.QUERIES)
    except ImportError:
        pass
    return reg


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }

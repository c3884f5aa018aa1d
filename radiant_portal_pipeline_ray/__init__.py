"""radiant_portal_pipeline_ray — a Ray-Data-native CDC / incremental-ingest engine.

Built from scratch with the data-processing capabilities of
radiant-network/radiant-portal-pipeline (see SURVEY.md), re-expressed as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- ``sources/``    changelog readers + deterministic synthetic generators
- ``functions/``  pure, vectorized per-batch kernels (text extraction, hashing)
- ``state/``      manifest / two-phase commit, partition assignment, hash-index actors
- ``stages/``     reusable Dataset→Dataset stages (normalize, merge, joins, dedup, ...)
- ``pipelines/``  end-to-end drivers (CDC apply loop, relational/text/similarity queries)

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (tests' conftest fixture, ``bench.py``, or the evaluation driver).
"""

from radiant_portal_pipeline_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"

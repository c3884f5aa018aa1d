"""User-extension surface: the ``Step`` protocol + registry (SURVEY §2.9).

Reference analogue: the task-type registry (``_TASK_TYPES`` maps a string to
a pydantic Task class with per-type hooks,
`radiant/tasks/vcf/experiment.py:99-159`) and the operator subclass
hierarchy for interaction patterns
(`radiant/tasks/starrocks/operator.py:54,158,220,358,416,488,537`) — here a
Step is simply ``(Dataset, StepContext) -> Dataset``, registered by name so
pipelines compose by configuration:

    @register_step("drop_short_docs")
    def drop_short(ds, ctx):
        n = ctx.params.get("min_tokens", 10)
        return ds.map_batches(...)

    out = run_steps(ds, ["normalize_text", "drop_short_docs"], params={...})

Steps stay Ray-Data-native (Dataset in, Dataset out, lazy); the registry is
the plug-in point for new ingestion kinds, exactly like the reference's
task types.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

from ray.data import Dataset

from radiant_portal_pipeline_ray.config import EngineConfig


@dataclass
class StepContext:
    """Shared step environment: engine config + free-form parameters."""

    config: EngineConfig = field(default_factory=EngineConfig)
    params: dict = field(default_factory=dict)


@runtime_checkable
class Step(Protocol):
    def __call__(self, ds: Dataset, ctx: StepContext) -> Dataset: ...


_STEPS: dict[str, Step] = {}


def register_step(name: str) -> Callable[[Step], Step]:
    """Decorator: add a Step to the global registry (last write wins)."""

    def deco(fn: Step) -> Step:
        _STEPS[name] = fn
        return fn

    return deco


def get_step(name: str) -> Step:
    try:
        return _STEPS[name]
    except KeyError:
        raise KeyError(
            f"unknown step {name!r}; registered: {sorted(_STEPS)}"
        ) from None


def registered_steps() -> list[str]:
    return sorted(_STEPS)


def run_steps(
    ds: Dataset,
    names: list[str],
    config: EngineConfig | None = None,
    params: dict | None = None,
) -> Dataset:
    """Compose registered steps left-to-right over a Dataset (lazy)."""
    ctx = StepContext(config=config or EngineConfig(), params=params or {})
    for n in names:
        ds = get_step(n)(ds, ctx)
    return ds


# ---- built-in steps (the common webtext front-end as pluggable pieces) ----

@register_step("extract_text")
def _extract_text_step(ds: Dataset, ctx: StepContext) -> Dataset:
    """Recompute ``text = extract_text(html)`` (the per-row invariant)."""
    import pyarrow as pa

    from radiant_portal_pipeline_ray.functions.text import extract_text

    def fn(b: pa.Table) -> pa.Table:
        text = extract_text(b.column("html"))
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        idx = b.schema.get_field_index("text")
        if idx >= 0:
            return b.set_column(idx, "text", text)
        return b.append_column(pa.field("text", pa.string()), text)

    return ds.map_batches(fn, batch_format="pyarrow")


@register_step("token_counts")
def _token_counts_step(ds: Dataset, ctx: StepContext) -> Dataset:
    from radiant_portal_pipeline_ray.stages.textstages import TokenizeStage

    return ds.map_batches(
        TokenizeStage(mode=ctx.params.get("tokenize_mode", "whitespace")),
        batch_format="pyarrow",
    )


@register_step("quality_scores")
def _quality_step(ds: Dataset, ctx: StepContext) -> Dataset:
    from radiant_portal_pipeline_ray.stages.textstages import QualityScoreStage

    return ds.map_batches(QualityScoreStage(), batch_format="pyarrow")


@register_step("lang_id")
def _lang_id_step(ds: Dataset, ctx: StepContext) -> Dataset:
    from radiant_portal_pipeline_ray.stages.textstages import LangIdStage

    return ds.map_batches(LangIdStage(), batch_format="pyarrow")


@register_step("filter_min_tokens")
def _filter_min_tokens(ds: Dataset, ctx: StepContext) -> Dataset:
    """Keep docs with at least ``params['min_tokens']`` whitespace tokens
    (requires a prior ``token_counts`` step)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = int(ctx.params.get("min_tokens", 1))

    def fn(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater_equal(pc.fill_null(b.column("n_tokens_ws"), 0), n)
        )

    return ds.map_batches(fn, batch_format="pyarrow")

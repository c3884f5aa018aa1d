"""Step protocol / registry (§2.9 extension surface)."""

import pyarrow as pa
import pytest
import ray.data as rd

from radiant_portal_pipeline_ray.steps import (
    StepContext,
    get_step,
    register_step,
    registered_steps,
    run_steps,
)


def test_builtin_step_composition(ray_session):
    docs = rd.from_arrow(
        pa.table(
            {
                "html": pa.array(
                    [b"<p>one two three four</p>", b"<p>just one</p>", None],
                    type=pa.binary(),
                ),
                "text": pa.array(["", "", None]),
            }
        )
    )
    out = run_steps(
        docs,
        ["extract_text", "token_counts", "filter_min_tokens"],
        params={"min_tokens": 3},
    )
    rows = out.take_all()
    assert len(rows) == 1
    assert rows[0]["text"] == "one two three four"
    assert rows[0]["n_tokens_ws"] == 4


def test_custom_step_registration(ray_session):
    @register_step("double_rows")
    def double(ds, ctx):
        return ds.union(ds)

    assert "double_rows" in registered_steps()
    ds = rd.from_arrow(pa.table({"x": [1, 2]}))
    assert run_steps(ds, ["double_rows"]).count() == 4
    assert isinstance(get_step("double_rows"), object)
    with pytest.raises(KeyError):
        get_step("nope_not_registered")


def test_step_context_params():
    ctx = StepContext(params={"a": 1})
    assert ctx.params["a"] == 1 and ctx.config.n_parts > 0

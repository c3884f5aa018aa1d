"""Multi-tenant namespace indirection + snapshot time-travel.

Reference analogues: ``get_radiant_mapping``
(`radiant/tasks/data/radiant_tables.py:189-201`) routes every table through
a per-tenant namespace, and
`tests/integration/dags/sql/test_snv_variant_tenant_isolation.py:73` asserts
writes to one tenant never appear in another; Iceberg snapshots give
queryable history (time-travel)."""

import os

import pyarrow.compute as pc
import pytest

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)
from radiant_portal_pipeline_ray.tenancy import TenantCatalog
from tests.test_apply import (
    assert_tables_equal,
    engine_state,
    oracle_final_state,
)


@pytest.fixture(scope="module")
def two_tenant_logs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tenant_cl")
    logs = {}
    for code, seed in [("acme", 7), ("globex", 8)]:
        spec = ChangelogSpec(n_urls=300, n_events=1200, n_batches=2, seed=seed)
        logs[code] = generate_changelog(str(d / code), spec)
    return logs


def test_two_tenants_disjoint_and_isolated(
    ray_session, tmp_path, two_tenant_logs
):
    cat = TenantCatalog(base_dir=str(tmp_path / "lakes"))
    cfg = EngineConfig(n_parts=4)
    for code, paths in two_tenant_logs.items():
        cat.engine(code, cfg).apply(paths)

    # each tenant's state equals ITS OWN oracle exactly — nothing leaked in
    for code, paths in two_tenant_logs.items():
        eng = cat.engine(code, cfg)
        assert_tables_equal(engine_state(eng), oracle_final_state(paths))

    # url populations are independent: the other tenant's exclusive urls
    # never appear (the reference's tenant-isolation assertion)
    urls = {
        code: set(engine_state(cat.engine(code, cfg)).column("url").to_pylist())
        for code in two_tenant_logs
    }
    only_acme = urls["acme"] - urls["globex"]
    assert only_acme  # different seeds → different url spaces
    assert urls["globex"].isdisjoint(only_acme)

    # every physical file of a tenant lives under that tenant's lake root
    for code in two_tenant_logs:
        eng = cat.engine(code, cfg)
        man = eng.lake.current_manifest()
        root = os.path.realpath(cat.lake_root(code))
        for st in man.partitions.values():
            for f in st.files:
                assert os.path.realpath(eng.lake.abspath(f)).startswith(root)

    assert cat.codes() == ["acme", "globex"]


def test_qa_all_runs_per_tenant(ray_session, tmp_path, two_tenant_logs):
    cat = TenantCatalog(base_dir=str(tmp_path / "lakes"))
    for code, paths in two_tenant_logs.items():
        cat.engine(code, EngineConfig(n_parts=4)).apply(paths)
    out = cat.qa_all()
    assert sorted(out) == ["acme", "globex"]
    for code, rep in out.items():
        assert rep["passed"], (code, rep)


def test_tenant_code_validation_and_mapping():
    cat = TenantCatalog(base_dir="/tmp/x")
    for bad in ["../escape", "a/b", "", ".hidden", "a" * 65]:
        with pytest.raises(ValueError):
            cat.lake_root(bad)
    m = TenantCatalog(mapping={"acme": "/tmp/elsewhere/acme"})
    assert m.lake_root("acme") == "/tmp/elsewhere/acme"
    with pytest.raises(KeyError):
        m.lake_root("globex")
    with pytest.raises(ValueError):
        TenantCatalog()
    with pytest.raises(ValueError):
        TenantCatalog(base_dir="/tmp/x", mapping={"a": "/tmp/a"})


def test_cli_tenant_resolution(ray_session, tmp_path, two_tenant_logs):
    from radiant_portal_pipeline_ray.__main__ import main

    root = str(tmp_path / "lakes")
    TenantCatalog(base_dir=root).engine("acme", EngineConfig(n_parts=4)).apply(
        two_tenant_logs["acme"]
    )
    assert main(["show", "--tenant-root", root, "--tenant", "acme"]) == 0
    assert main(["qa", "--tenant-root", root]) == 0  # all-tenant QA loop
    with pytest.raises(SystemExit):
        main(["show", "--tenant-root", root])  # show needs a tenant
    with pytest.raises(SystemExit):
        main(
            ["show", "--lake", root, "--tenant-root", root, "--tenant", "acme"]
        )  # exclusive


def test_snapshot_time_travel(ray_session, tmp_lake, two_tenant_logs):
    paths = two_tenant_logs["acme"]
    eng = CdcEngine(tmp_lake, EngineConfig(n_parts=4))
    eng.apply(paths[:1])
    v1 = eng.snapshot_table()
    v1 = v1.take(pc.sort_indices(v1, sort_keys=[("url", "ascending")]))
    eng.apply(paths[1:])

    # current state moved on...
    want_now = oracle_final_state(paths)
    assert_tables_equal(engine_state(eng), want_now)

    # ...but version 1 is still readable, row-identical to the pre-apply view
    old = eng.snapshot_table(version=1)
    old = old.take(pc.sort_indices(old, sort_keys=[("url", "ascending")]))
    assert old.equals(v1)
    from tests.test_apply import DATA_COLS

    assert_tables_equal(
        old.select(DATA_COLS), oracle_final_state(paths[:1])
    )

    # the streaming read honors version too
    ds_old = eng.read_snapshot(version=1)
    assert ds_old.count() == v1.num_rows

    with pytest.raises(FileNotFoundError):
        eng.snapshot_table(version=99)

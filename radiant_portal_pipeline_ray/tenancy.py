"""Multi-tenant namespace indirection.

Reference analogue: every reference table name resolves through
``get_radiant_mapping(conf, tenant_code)``
(`radiant/tasks/data/radiant_tables.py:189-201`) so one deployment serves
many isolated tenant namespaces; isolation is asserted by
`tests/integration/dags/sql/test_snv_variant_tenant_isolation.py:73`.

Here the namespace unit is a LAKE ROOT: each tenant code resolves to its
own lake directory (convention ``base_dir/<code>`` or an explicit mapping),
each with independent manifests, watermarks, partitioner state and QA.
Nothing is shared between tenants — no cross-tenant file, manifest, or
salt-map reference is possible by construction, because every path the
engine touches is derived from the tenant's lake root.
"""

from __future__ import annotations

import os
import re

from radiant_portal_pipeline_ray.config import EngineConfig
from radiant_portal_pipeline_ray.pipelines.apply import CdcEngine

_CODE_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_\-]{0,63}$")


class TenantCatalog:
    """``{tenant_code → lake_root}`` resolver.

    Two construction modes (exactly one):
    - ``base_dir``: conventional layout, tenant ``t`` lives at
      ``base_dir/t`` (the reference's prefix-naming analogue);
    - ``mapping``: explicit ``{code: lake_root}`` (the reference's
      conf-driven ``get_radiant_mapping``).
    """

    def __init__(
        self,
        base_dir: str | None = None,
        mapping: dict[str, str] | None = None,
    ):
        if (base_dir is None) == (mapping is None):
            raise ValueError("pass exactly one of base_dir / mapping")
        self.base_dir = base_dir
        self.mapping = dict(mapping) if mapping else None
        if self.mapping:
            for code in self.mapping:
                self._validate(code)

    @staticmethod
    def _validate(code: str) -> str:
        if not _CODE_RE.match(code):
            raise ValueError(
                f"invalid tenant code {code!r} (alnum/dash/underscore, "
                "must not traverse paths)"
            )
        return code

    def lake_root(self, code: str) -> str:
        self._validate(code)
        if self.mapping is not None:
            try:
                return self.mapping[code]
            except KeyError:
                raise KeyError(f"unknown tenant {code!r}") from None
        return os.path.join(self.base_dir, code)

    def engine(self, code: str, config: EngineConfig | None = None) -> CdcEngine:
        return CdcEngine(self.lake_root(code), config)

    def codes(self) -> list[str]:
        """Known tenants: mapping keys, or base_dir subdirs that contain a
        committed lake (a ``manifests`` directory)."""
        if self.mapping is not None:
            return sorted(self.mapping)
        if not self.base_dir or not os.path.isdir(self.base_dir):
            return []
        return sorted(
            d
            for d in os.listdir(self.base_dir)
            if _CODE_RE.match(d)
            and os.path.isdir(os.path.join(self.base_dir, d, "manifests"))
        )

    def qa_all(
        self, config: EngineConfig | None = None
    ) -> dict[str, dict]:
        """Per-tenant QA loop (reference `data_integrity_starrocks.py` runs
        integrity checks per tenant database): the standard snapshot check
        suite against every committed tenant, keyed by tenant code."""
        from radiant_portal_pipeline_ray.stages.qa import (
            run_checks,
            snapshot_checks,
        )

        out: dict[str, dict] = {}
        for code in self.codes():
            eng = self.engine(code, config)
            out[code] = run_checks(eng.read_snapshot(), snapshot_checks())
        return out

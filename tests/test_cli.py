"""CLI surface: apply → compact → show → qa → gc through __main__.main()."""

import json

from radiant_portal_pipeline_ray.__main__ import main
from radiant_portal_pipeline_ray.sources.generator import (
    ChangelogSpec,
    generate_changelog,
)


def test_cli_lifecycle(ray_session, tmp_path, capsys):
    paths = generate_changelog(
        str(tmp_path / "cl"),
        ChangelogSpec(n_urls=200, n_events=1000, n_batches=2, seed=8),
    )
    lake = str(tmp_path / "lake")

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    r1 = run("apply", "--lake", lake, "--changelog", *paths, "--n-parts", "4")
    assert r1["version"] == 1 and r1["rows_upserted"] > 0

    rc = run("compact", "--lake", lake, "--min-files", "1")
    assert rc["version"] == 2

    rs = run("show", "--lake", lake)
    assert rs["version"] == 2 and rs["rows"] > 0 and rs["n_parts"] == 4

    rq = run("qa", "--lake", lake)
    assert rq["passed"] is True

    rr = run("reshard", "--lake", lake, "--new-n-parts", "8")
    assert rr["n_parts"] == 8
    rs8 = run("show", "--lake", lake)
    assert rs8["n_parts"] == 8 and rs8["rows"] == rs["rows"]

    rg = run("gc", "--lake", lake, "--keep-versions", "1", "--staging-age-s", "0")
    assert isinstance(rg["removed"], list)

    # the session fixture's Ray must still be alive (CLI must not shut down
    # a session it did not create)
    import ray

    assert ray.is_initialized()

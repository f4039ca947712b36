"""python -m maup_ray — the ray-job-submit-shaped CLI entrypoint."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    # cwd MUST be the repo root: Ray workers resolve maup_ray via the
    # driver's cwd (verify-skill gotcha #1)
    return subprocess.run(
        [sys.executable, "-m", "maup_ray", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )


def test_list_names_every_registered_query():
    r = _run("list")
    assert r.returncode == 0, r.stderr
    lines = dict(
        ln.split("\t") for ln in r.stdout.strip().splitlines()
    )
    sys.path.insert(0, REPO)
    import __ray_entry__ as e

    assert set(lines) == set(e.queries())
    assert set(e.oracle_sql()) == {
        n for n, tag in lines.items() if tag == "sql-oracled"
    }


def test_run_partitioned_then_resume(tmp_path):
    out = str(tmp_path / "lang")
    r1 = _run(
        "run", "lang_id", "--out", out, "--partition-col", "lang_pred",
        "--num-cpus", "4",
    )
    assert r1.returncode == 0, r1.stderr
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["rows"] == 500 and s1["partitions"] == 2
    assert s1["skipped_partitions"] == 0
    # kill one partition's marker: ONLY it recomputes
    os.remove(os.path.join(out, "part=en", "_SUCCESS"))
    r2 = _run(
        "run", "lang_id", "--out", out, "--partition-col", "lang_pred",
        "--num-cpus", "4",
    )
    assert r2.returncode == 0, r2.stderr
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["partitions"] == 1 and s2["skipped_partitions"] == 1
    # manifest sees both partitions complete again
    r3 = _run("manifest", out)
    assert r3.returncode == 0, r3.stderr
    assert "en" in r3.stdout and "und" in r3.stdout

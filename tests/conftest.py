import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cli(*args, expect: int = 0):
    """Run ``python -m geomesa_nifi_ray`` in a fresh process (own Ray
    session) and assert the exit code; the one CLI invocation helper for
    every test module. Returns the CompletedProcess — consumers parse the
    LAST stdout line as the JSON summary (see :func:`run_cli_json`)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, "-m", "geomesa_nifi_ray", "--num-cpus", "2", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == expect, out.stderr[-2000:]
    return out


def run_cli_json(*args) -> dict:
    import json

    out = run_cli(*args)
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_lake(tmp_path):
    return str(tmp_path / "lake")

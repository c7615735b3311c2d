"""The examples/tutorial.py walkthrough runs end to end (the reference ships
DETRPose_tutorial.ipynb as its install->inference smoke test, SURVEY section 4;
this pins our equivalent)."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tutorial_runs_end_to_end(tmp_path):
    out = tmp_path / "overlay.jpg"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "tutorial.py"),
         "--size", "n", "--res", "160", "--cpu", "--thresh", "0.01",
         "--output", str(out)],
        capture_output=True, text=True, timeout=900, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "steady-state latency" in r.stdout
    assert out.exists() and out.stat().st_size > 1000

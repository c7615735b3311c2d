"""Drive the visual-inference CLI end to end (BASELINE config #4: video
stream inference through one jitted fixed-shape pipeline; reference:
tools/inference/torch_inf.py:51-110)."""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_video_inference_cli(tmp_path):
    cv2 = pytest.importorskip("cv2")
    inp = str(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    w = cv2.VideoWriter(inp, cv2.VideoWriter_fourcc(*"mp4v"), 5, (320, 240))
    rng = np.random.default_rng(0)
    for _ in range(4):
        w.write(rng.integers(0, 255, (240, 320, 3), np.uint8))
    w.release()

    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "detrpose_tpu.tools.infer",
         "--size", "n", "--input", inp, "--output", out],
        capture_output=True, text=True, timeout=900, env=env,
        cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.isfile(out), "--output file path must produce a file"
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 4

"""End-to-end coverage of the primary user entry point: the train.py CLI as a
subprocess — argparse -> LazyConfig -> overrides -> fit / --eval --resume /
--test (reference workflow: train.py:37-64). The Trainer API underneath is
already covered by test_trainer_e2e; this pins the CLI wiring itself, which
previously had no process-level test (an import typo or argparse regression
would have shipped).
"""
import json
import os
import subprocess
import sys

import pytest

from synth_data import make_tiny_coco

REPO = "/root/repo"


def _run(args, timeout=1800):
    env = dict(os.environ)
    # single CPU device: the CLI meshes over every visible device and the
    # conftest's 8-virtual-device XLA_FLAGS would not divide batch 2
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "train.py"] + args,
                       capture_output=True, text=True, timeout=timeout,
                       env=env, cwd=REPO)
    assert r.returncode == 0, f"train.py {args[:4]}...\n{r.stdout}\n{r.stderr}"
    return r


def _last_json_line(stdout):
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in stdout:\n{stdout}")


@pytest.mark.slow
def test_train_cli_fit_eval_test(tmp_path):
    img_dir, ann = make_tiny_coco(str(tmp_path), n_images=4, w=160, h=160)
    out_dir = str(tmp_path / "out")
    common = [
        "--config", "configs/coco/detrpose_n.py",
        "--output-dir", out_dir, "--batch-size", "2",
        "--val-img-dir", img_dir, "--val-ann", ann,
        "--options",
        "training_params.base_size=160",
        "training_params.eval_batch_size=2",
        "training_params.num_workers=2",
        "training_params.policy_epochs=[99,100,101]",  # no heavy augs
        "training_params.base_size_repeat=None",       # single scale
    ]

    # ---- 1) fit one epoch (reference: train.py -> Trainer.fit)
    _run(["--img-dir", img_dir, "--ann", ann, "--epochs", "1"] + common)
    assert os.path.isfile(os.path.join(out_dir, "config.yaml"))
    log_path = os.path.join(out_dir, "log.txt")
    assert os.path.isfile(log_path)
    with open(log_path) as f:
        rec = json.loads(f.readline())
    assert rec["epoch"] == 0
    assert "AP" in rec, rec
    for ckpt in ["checkpoint", "best"]:
        assert os.path.isdir(os.path.join(out_dir, ckpt)), ckpt

    # ---- 2) --eval --resume best (reference: train.py --eval --resume)
    r = _run(["--eval", "--resume", os.path.join(out_dir, "best")] + common)
    metrics = _last_json_line(r.stdout)
    assert "AP" in metrics and 0.0 <= metrics["AP"] <= 1.0, metrics

    # ---- 3) --test writes results.json (test-dev submission format,
    # reference trainer.py:324-341)
    _run(["--test", "--resume", os.path.join(out_dir, "best")] + common)
    res_path = os.path.join(out_dir, "results.json")
    assert os.path.isfile(res_path)
    with open(res_path) as f:
        results = json.load(f)
    assert isinstance(results, list) and results, "non-empty detection list"
    r0 = results[0]
    assert {"image_id", "category_id", "keypoints", "score"} <= set(r0)
    assert len(r0["keypoints"]) == 17 * 3

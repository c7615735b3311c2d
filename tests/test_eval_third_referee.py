"""Three-way evaluator cross-validation (VERDICT r2 #3).

The production `KeypointEvaluator`, the clean-room `coco_protocol_ref`, and a
transcription of the canonical pycocotools COCOeval (`pycoco_transcription`,
driven through the REFERENCE repo's inlined print-free copy of
COCOeval.evaluate, src/data/coco_eval.py:250-296) must produce the identical
stats vector on the randomized edge-case battery. The first two share an
author; the third is anchored to the published pycocotools text and the
reference's own orchestration loop, so correlated protocol misreadings
(crowd re-match, detection-area ignore, mergesort tie-breaks) now disagree
instead of agreeing.
"""
import sys
import types

import numpy as np
import pytest

from detrpose_tpu.ops.oks import keypoint_sigmas

from coco_protocol_ref import evaluate as cleanroom_evaluate
from pycoco_transcription import MiniCOCOeval
from test_eval_protocol import _rand_scene, _run_production

K = 17


def _load_ref_evaluate():
    """Import the reference's inlined COCOeval.evaluate with pycocotools and
    torchvision stubbed (the inlined function itself touches neither)."""
    import ref_loader

    ref_loader.install_torchvision_stub()
    ref_loader.load_reference()
    if "pycocotools" not in sys.modules:
        pc = types.ModuleType("pycocotools")
        cocoeval = types.ModuleType("pycocotools.cocoeval")
        cocoeval.COCOeval = object
        coco = types.ModuleType("pycocotools.coco")
        coco.COCO = object
        mask = types.ModuleType("pycocotools.mask")
        for name, mod in [("pycocotools", pc),
                          ("pycocotools.cocoeval", cocoeval),
                          ("pycocotools.coco", coco),
                          ("pycocotools.mask", mask)]:
            sys.modules[name] = mod
    import importlib

    coco_eval_mod = importlib.import_module("refsrc.data.coco_eval")
    return coco_eval_mod.evaluate


def _run_transcription(gts, dets, ref_evaluate):
    mini = MiniCOCOeval(gts, dets, keypoint_sigmas(K))
    # the REFERENCE's inlined evaluate() drives _prepare/computeOks/evaluateImg
    img_ids, eval_imgs = ref_evaluate(mini)
    assert list(img_ids) == sorted(gts.keys())
    # (catIds, areaRng, imgIds) order matches accumulate's Nk+Na+i indexing
    mini.evalImgs = list(eval_imgs.reshape(-1))
    mini._paramsEval = mini.params
    mini.accumulate()
    return mini.summarize()


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_three_referees_agree(seed):
    ref_evaluate = _load_ref_evaluate()
    rng = np.random.default_rng(seed)
    gts, dets = _rand_scene(rng, use_area=True)

    got = _run_production(gts, dets, use_area=True)
    cleanroom = cleanroom_evaluate(gts, dets, keypoint_sigmas(K), use_area=True)
    canonical = _run_transcription(gts, dets, ref_evaluate)

    for k, v in canonical.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (
            f"{k}: production={got[k]} canonical={v}")
        if k in cleanroom:
            assert cleanroom[k] == pytest.approx(v, abs=1e-9), (
                f"{k}: cleanroom={cleanroom[k]} canonical={v}")


def test_referee_exact_fixture():
    """The hand-derived AP=0.5 fixture (see test_eval_protocol) holds for the
    canonical transcription too."""
    ref_evaluate = _load_ref_evaluate()
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    v = np.ones(K)
    g = {"keypoints": np.concatenate([kxy, v[:, None]], 1),
         "area": 150.0 * 150.0, "bbox": [100.0, 100.0, 150.0, 150.0],
         "iscrowd": 0, "num_keypoints": K}
    kp = np.concatenate([kxy, np.ones((K, 1))], 1)
    kp_far = np.concatenate([kxy + 5000.0, np.ones((K, 1))], 1)
    stats = _run_transcription(
        {0: [g]},
        {0: [{"score": 0.8, "keypoints": kp},
             {"score": 0.9, "keypoints": kp_far}]},
        ref_evaluate)
    assert stats["AP"] == pytest.approx(0.5, abs=1e-12)
    assert stats["AR"] == pytest.approx(1.0)

"""Cross-validate KeypointEvaluator against an independent clean-room
implementation of the COCO keypoint protocol (coco_protocol_ref.py) plus
hand-derived exact fixtures.

This is the referee for the AP-parity acceptance path (VERDICT round-1 #2):
pycocotools is not installed in this environment, so agreement between two
independently structured implementations on randomized edge cases (crowd,
ignore, area ranges, invisible keypoints, score ties) plus hand-computed
golden values is the strongest available check of the evaluator the COCO
acceptance test relies on. Reference protocol: src/data/coco_eval.py:250-296
(inlined pycocotools COCOeval) and src/data/crowdpose_eval.py (use_area=False).
"""
import numpy as np
import pytest

from detrpose_tpu.data.evaluator import KeypointEvaluator
from detrpose_tpu.ops.oks import keypoint_sigmas

from coco_protocol_ref import evaluate as ref_evaluate

K = 17


def _gt(kxy, vis=None, area=None, bbox=None, iscrowd=0, num_keypoints=None):
    kxy = np.asarray(kxy, np.float64).reshape(-1, 2)
    v = np.ones(len(kxy)) if vis is None else np.asarray(vis, np.float64)
    kp = np.concatenate([kxy, v[:, None]], 1)
    if bbox is None:
        x0, y0 = kxy.min(0) - 5
        x1, y1 = kxy.max(0) + 5
        bbox = [x0, y0, x1 - x0, y1 - y0]
    if area is None:
        area = bbox[2] * bbox[3]
    return {
        "keypoints": kp, "area": float(area), "bbox": list(map(float, bbox)),
        "iscrowd": iscrowd,
        "num_keypoints": int((v > 0).sum()) if num_keypoints is None else num_keypoints,
    }


def _run_production(gts, dets, use_area=True, crowd_index=None):
    ev = KeypointEvaluator({i: {"anns": a} for i, a in gts.items()},
                           num_keypoints=K, use_area=use_area,
                           crowd_index=crowd_index)
    for img, ds in dets.items():
        if ds:
            ev.update(img,
                      np.array([d["score"] for d in ds]),
                      np.stack([np.asarray(d["keypoints"], np.float64) for d in ds]))
    ev.accumulate()
    return ev.summarize()


def _rand_scene(rng, n_imgs=8, use_area=True):
    """Random GTs + detections hitting crowd/ignore/area/visibility edges."""
    gts, dets = {}, {}
    for img in range(n_imgs):
        G = int(rng.integers(0, 5))
        anns = []
        for _ in range(G):
            side = float(rng.choice([20, 50, 200]))  # spans all area ranges
            c = rng.uniform(100, 500, 2)
            kxy = c + rng.normal(0, side / 4, (K, 2))
            vis = (rng.random(K) > 0.2).astype(np.float64)
            if rng.random() < 0.1:
                vis[:] = 0.0  # no visible keypoints -> ignored + box fallback
            anns.append(_gt(kxy, vis, area=side * side,
                            bbox=[c[0] - side / 2, c[1] - side / 2, side, side],
                            iscrowd=int(rng.random() < 0.15)))
        gts[img] = anns
        ds = []
        for g in anns:
            if rng.random() < 0.8:  # jittered true positive
                kp = np.asarray(g["keypoints"]).copy()
                kp[:, :2] += rng.normal(0, np.sqrt(g["area"]) * 0.05, (K, 2))
                kp[:, 2] = 1.0
                ds.append({"score": float(rng.uniform(0.3, 1.0)), "keypoints": kp})
        for _ in range(int(rng.integers(0, 3))):  # false positives
            kxy = rng.uniform(0, 600, (K, 2))
            kp = np.concatenate([kxy, np.ones((K, 1))], 1)
            ds.append({"score": float(rng.uniform(0.0, 0.9)), "keypoints": kp})
        dets[img] = ds
    return gts, dets


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("use_area", [True, False])
def test_randomized_protocol_agreement(seed, use_area):
    rng = np.random.default_rng(seed)
    gts, dets = _rand_scene(rng, use_area=use_area)
    got = _run_production(gts, dets, use_area=use_area)
    want = ref_evaluate(gts, dets, keypoint_sigmas(K), use_area=use_area)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), (
            f"{k}: production={got[k]} cleanroom={v}")


def test_perfect_detection_ap1():
    """One large GT, one exact detection: AP = AR = 1 at every threshold."""
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    g = _gt(kxy, area=150 * 150, bbox=[100, 100, 150, 150])
    gts = {0: [g]}
    kp = np.concatenate([kxy, np.ones((K, 1))], 1)
    dets = {0: [{"score": 0.9, "keypoints": kp}]}
    got = _run_production(gts, dets)
    assert got["AP"] == pytest.approx(1.0)
    assert got["AP50"] == pytest.approx(1.0)
    assert got["AR"] == pytest.approx(1.0)
    assert got["AP_large"] == pytest.approx(1.0)
    assert got["AP_medium"] == -1.0  # no medium GTs -> undefined split


def test_miss_is_ap0():
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    g = _gt(kxy, area=150 * 150, bbox=[100, 100, 150, 150])
    kp_far = np.concatenate([kxy + 5000.0, np.ones((K, 1))], 1)
    got = _run_production({0: [g]}, {0: [{"score": 0.9, "keypoints": kp_far}]})
    assert got["AP"] == pytest.approx(0.0)
    assert got["AR"] == pytest.approx(0.0)


def test_high_score_fp_halves_precision():
    """Perfect TP (score .8) + far FP (score .9).

    Hand-derived: cumulative tp=[0,1], fp=[1,1] -> recall=[0,1],
    precision=[0,0.5]; envelope=[0.5,0.5]; every one of the 101 recall grid
    points reads 0.5 -> AP = 0.5 exactly.
    """
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    g = _gt(kxy, area=150 * 150, bbox=[100, 100, 150, 150])
    kp = np.concatenate([kxy, np.ones((K, 1))], 1)
    kp_far = np.concatenate([kxy + 5000.0, np.ones((K, 1))], 1)
    got = _run_production(
        {0: [g]},
        {0: [{"score": 0.8, "keypoints": kp},
             {"score": 0.9, "keypoints": kp_far}]})
    assert got["AP"] == pytest.approx(0.5, abs=1e-12)
    assert got["AR"] == pytest.approx(1.0)  # the TP is still found


def test_crowd_gt_matches_are_ignored_not_fp():
    """A det matching only an iscrowd GT is ignored (neither TP nor FP)."""
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    crowd = _gt(kxy, area=150 * 150, bbox=[100, 100, 150, 150], iscrowd=1)
    real = _gt(kxy + 1000, area=150 * 150, bbox=[1100, 1100, 150, 150])
    kp_crowd = np.concatenate([kxy, np.ones((K, 1))], 1)
    kp_real = np.concatenate([kxy + 1000, np.ones((K, 1))], 1)
    got = _run_production(
        {0: [crowd, real]},
        {0: [{"score": 0.9, "keypoints": kp_crowd},
             {"score": 0.8, "keypoints": kp_real}]})
    # crowd-matched det is ignored; the real TP gives clean AP=1
    assert got["AP"] == pytest.approx(1.0)


def test_zero_visible_gt_is_pure_ignore():
    """GT with num_keypoints=0 doesn't count toward recall denominator."""
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    invisible = _gt(kxy, vis=np.zeros(K), area=150 * 150,
                    bbox=[100, 100, 150, 150])
    real = _gt(kxy + 1000, area=150 * 150, bbox=[1100, 1100, 150, 150])
    kp_real = np.concatenate([kxy + 1000, np.ones((K, 1))], 1)
    got = _run_production({0: [invisible, real]},
                          {0: [{"score": 0.8, "keypoints": kp_real}]})
    assert got["AP"] == pytest.approx(1.0)
    assert got["AR"] == pytest.approx(1.0)


def test_crowdpose_splits():
    """crowd_index routes images into easy/medium/hard AP splits."""
    kxy = np.linspace(100, 300, K * 2).reshape(K, 2)
    kp = np.concatenate([kxy, np.ones((K, 1))], 1)
    kp_far = np.concatenate([kxy + 5000.0, np.ones((K, 1))], 1)
    g = lambda: _gt(kxy, area=150 * 150, bbox=[100, 100, 150, 150])
    gts = {0: [g()], 1: [g()]}
    dets = {0: [{"score": 0.9, "keypoints": kp}],       # easy image: hit
            1: [{"score": 0.9, "keypoints": kp_far}]}   # hard image: miss
    got = _run_production(gts, dets, use_area=False,
                          crowd_index={0: 0.05, 1: 0.9})
    assert got["AP_easy"] == pytest.approx(1.0)
    assert got["AP_hard"] == pytest.approx(0.0)
    assert got["AP"] == pytest.approx(0.5, abs=0.01)  # pooled over both images

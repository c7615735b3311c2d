"""End-to-end eval-pipeline parity: torch reference vs this framework.

VERDICT round-1 #3: the COCO-AP acceptance path (model forward -> PostProcess
-> original-size rescale -> KeypointEvaluator) had never been exercised end to
end against the reference pipeline. Here both pipelines run the SAME weights
(reference torch DETRPose-N state_dict, converted) over the SAME ≥100 images,
decode with their own PostProcess (reference: src/models/detrpose/
postprocesses.py:6-40; ours: models/postprocess.py), and are scored by the
same cross-validated evaluator. Ground truths are planted on the torch
pipeline's own top detections, so AP is high and *sensitive*: any deviation in
model numerics, top-k decode, or rescale shifts it.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
from detrpose_tpu.configs import build_model
from detrpose_tpu.data.evaluator import KeypointEvaluator
from detrpose_tpu.models.postprocess import postprocess
from detrpose_tpu.utils.convert import convert_state_dict

K = 17
HW = 160
N_IMAGES = 104
BATCH = 8


def _run_evaluator(gts, dets_by_img):
    ev = KeypointEvaluator(gts, K)
    for img_id, (scores, kpts) in dets_by_img.items():
        ev.update(img_id, scores, kpts)
    ev.accumulate()
    return ev.summarize()


@pytest.mark.slow
def test_eval_pipeline_ap_parity():
    ref_loader.install_torchvision_stub()
    torch.manual_seed(0)
    ref_model, cfg = ref_loader.build_reference_model("n", eval_hw=(HW, HW))
    sd = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
    # spread the two-stage selection scores so torch/jax top-k order is
    # well-defined with random weights (see test_model_parity.py)
    sd["transformer.enc_out_class_embed.weight"] = (
        sd["transformer.enc_out_class_embed.weight"] * 50.0)
    ref_model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    ref_model.eval()

    import importlib

    pp_mod = importlib.import_module("refsrc.models.detrpose.postprocesses")
    ref_pp = pp_mod.PostProcess(num_select=60, num_body_points=K)

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (N_IMAGES, HW, HW, 3)).astype(np.float32)
    # varied original sizes exercise the rescale path
    orig_wh = rng.integers(200, 640, (N_IMAGES, 2)).astype(np.float32)

    # ---- torch pipeline -------------------------------------------------
    torch_dets = {}
    with torch.no_grad():
        for s in range(0, N_IMAGES, BATCH):
            xb = torch.from_numpy(images[s:s + BATCH].transpose(0, 3, 1, 2))
            sizes = torch.from_numpy(orig_wh[s:s + BATCH])
            results = ref_pp(ref_model(xb), sizes)
            for b, r in enumerate(results):
                torch_dets[s + b] = (
                    r["scores"].numpy().copy(),
                    r["keypoints"].numpy().reshape(-1, K, 3).copy())

    # plant GTs on the torch pipeline's top detection per image
    gts = {}
    for img_id, (scores, kpts) in torch_dets.items():
        k0 = kpts[0]
        x0, y0 = k0[:, 0].min(), k0[:, 1].min()
        x1, y1 = k0[:, 0].max(), k0[:, 1].max()
        bbox = [float(x0), float(y0), float(x1 - x0 + 1), float(y1 - y0 + 1)]
        gts[img_id] = {"anns": [{
            "keypoints": np.concatenate([k0[:, :2], np.ones((K, 1))], 1),
            "area": bbox[2] * bbox[3], "bbox": bbox,
            "iscrowd": 0, "num_keypoints": K,
        }]}

    stats_t = _run_evaluator(gts, torch_dets)

    # ---- jax pipeline (converted weights) --------------------------------
    model = build_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))
    variables = convert_state_dict(sd, jax.tree.map(lambda x: x, dict(template)))

    jit_eval = jax.jit(lambda v, img, ts: postprocess(
        model.apply(v, img, train=False), ts, num_body_points=K))

    jax_dets = {}
    for s in range(0, N_IMAGES, BATCH):
        scores, labels, kpts = jit_eval(
            variables, jnp.asarray(images[s:s + BATCH]),
            jnp.asarray(orig_wh[s:s + BATCH]))
        scores, kpts = np.asarray(scores), np.asarray(kpts)
        for b in range(scores.shape[0]):
            jax_dets[s + b] = (scores[b].copy(), kpts[b].copy())

    stats_j = _run_evaluator(gts, jax_dets)

    # The pipelines should agree. With RANDOM weights the two-stage top-k
    # selection has near-tied scores, so a few slots legitimately flip order
    # between torch and jax (see test_model_parity.py) and shift AP slightly;
    # trained checkpoints have well-separated scores. 0.02 bounds the tie
    # noise while still catching any decode/rescale/eval bug (those shift AP
    # by >> 0.1 on planted GTs).
    assert stats_t["AP"] > 0.5, f"planted-GT AP should be high: {stats_t}"
    assert stats_j["AP"] > 0.5, f"planted-GT AP should be high: {stats_j}"
    for key in ("AP", "AP50", "AP75", "AR"):
        assert abs(stats_t[key] - stats_j[key]) < 0.02, (
            f"{key}: torch={stats_t[key]:.6f} jax={stats_j[key]:.6f}")

    # per-image top-1 keypoint agreement (original-pixel space)
    deltas = [np.abs(torch_dets[i][1][0] - jax_dets[i][1][0]).max()
              for i in range(N_IMAGES)]
    assert np.median(deltas) < 0.5, np.median(deltas)  # px, at <=640px scale

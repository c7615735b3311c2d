"""Overfit acceptance run: train DETRPose-N on a tiny DRAWN synthetic set on
the real TPU and verify the AP evaluator reports real learning.

This is the strongest in-sandbox evidence toward the COCO-AP north-star
beyond gradient parity: it exercises model + CDN + matcher + criterion +
optimizer + EMA + postprocess + evaluator end to end and demands that the
composition actually LEARNS (poses are rendered visibly, so the task is
detection, not memorization). Not part of the package; a one-off probe.

Runtime notes (see ARCHITECTURE.md): no device->host reads happen during
training — sampled loss scalars are kept as live device arrays and read only
after the last step, because the first read of a process permanently degrades
dispatch ~100x on this sandbox runtime.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

from detrpose_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from synth_data import make_tiny_coco
from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.data.coco import CocoKeypointDataset
from detrpose_tpu.data.evaluator import KeypointEvaluator
from detrpose_tpu.data.loader import KeypointLoader
from detrpose_tpu.data.transforms import EvalTransforms
from detrpose_tpu.models import postprocess
from detrpose_tpu.parallel import init_train_state, make_train_step
from detrpose_tpu.train.optim import make_optimizer

K = 17
RES = 160
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
N_IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 128
# staged epochs: each is a fresh shuffle + fresh CDN noise (and fresh
# augmentation draws when AUG). The batches are pre-staged on device and
# cycled, so more staged epochs = more data diversity per image.
STAGE_EPOCHS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
# "aug" = train with the reference-style TrainTransforms policy
# (mosaic/zoom-out/flip/jitter) instead of plain EvalTransforms resize —
# the generalization configuration.
AUG = len(sys.argv) > 4 and sys.argv[4] == "aug"
SAMPLE_EVERY = 250
# Constant LR until 85% of the run, then x0.1 — from-scratch DETR training
# needs the decay to settle (recorded: constant-LR 20k-step run plateaued
# at train AP 0.60 with the loss still falling).
DECAY_AT = max(1, int(STEPS * 0.85))

img_dir, ann = make_tiny_coco("/tmp/synth_overfit", n_images=N_IMG, w=RES,
                              h=RES, people=2, draw=True, structured=True)
mcfg = model_config("n", dtype=jnp.bfloat16)
model = build_model(mcfg)

if AUG:
    from detrpose_tpu.data.transforms import TrainTransforms

    # full reference-style policy: mosaic in the first half of the staged
    # window, zoom-out/flip/jitter throughout
    tf = TrainTransforms(out_size=RES, num_keypoints=K,
                         policy_epochs=(0, max(1, STAGE_EPOCHS // 2),
                                        STAGE_EPOCHS))
else:
    tf = EvalTransforms(out_size=RES)
ds = CocoKeypointDataset(img_dir, ann, K, train=True, transforms=tf)
loader = KeypointLoader(ds, batch_size=16, num_keypoints=K, train=True,
                        base_size=RES, num_queries=mcfg.num_queries, seed=0)


def _stage(raw):
    # pre-stage fixed batches on device once — CDN noise is fixed per batch
    # across steps, which is fine for an overfit/generalization probe
    b = {"images": jnp.asarray(raw["images"], jnp.float32),
         "targets": jax.tree.map(jnp.asarray, dict(raw["targets"]))}
    if "dn" in raw:
        dn = dict(raw["dn"])
        b["dn"] = {
            "labels": jnp.asarray(dn["labels"]),
            "slot_used": jnp.asarray(dn["slot_used"]),
            "pose_logits": jnp.asarray(dn["pose_logits"]),
            "attn_mask": jnp.asarray(dn["attn_mask"]),
            "dn_match": jax.tree.map(jnp.asarray, dict(dn["dn_match"])),
        }
    return b


batches = []
for e in range(max(1, STAGE_EPOCHS)):
    # Each staged epoch is a fresh shuffle + fresh augmentation/CDN draws,
    # so no image is always seen with the same pixels/batchmates/noise.
    loader.set_epoch(e)
    batches += [_stage(r) for r in loader]
print(f"{N_IMG} images x {max(1, STAGE_EPOCHS)} staged epochs"
      f" ({'augmented' if AUG else 'unaugmented'})"
      f" = {len(batches)} distinct batches of 16")

params_shape = jax.eval_shape(lambda: model.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=True))["params"]
tx = make_optimizer(params_shape, milestones=(DECAY_AT,))
state = init_train_state(model, tx, jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3)))
step = jax.jit(make_train_step(model, tx, num_body_points=K,
                               num_classes=mcfg.num_classes))

t0 = time.perf_counter()
samples = []  # (step, device scalar) — read only after training
for i in range(STEPS):
    state, metrics = step(state, batches[i % len(batches)])
    if (i + 1) % SAMPLE_EVERY == 0 or i == 0:
        samples.append((i + 1, metrics["loss_total"]))
jax.block_until_ready(state.params)
train_s = time.perf_counter() - t0
curve = [(s, float(v)) for s, v in samples]
print(f"train: {STEPS} steps in {train_s:.1f}s "
      f"({train_s / STEPS * 1000:.1f} ms/step)")
print("loss curve:", json.dumps([[s, round(v, 2)] for s, v in curve]))
assert all(np.isfinite(v) for _, v in curve)

# ---- AP on the same (train==val) set, regular weights then EMA
vds = CocoKeypointDataset(img_dir, ann, K, train=False,
                          transforms=EvalTransforms(out_size=RES))


def build_gts(ds):
    return {
        i: {"anns": [
            {"keypoints": np.asarray(a["keypoints"], np.float64).reshape(K, 3),
             "area": a["area"], "bbox": a["bbox"], "iscrowd": 0,
             "num_keypoints": K}
            for a in ds.anns_by_img.get(i, [])]}
        for i in ds.ids
    }


val_gts = build_gts(vds)
vloader = KeypointLoader(vds, batch_size=16, num_keypoints=K, train=False,
                         with_cdn=False, drop_last=False)


@jax.jit
def eval_fn(v, img, ts):
    return postprocess(model.apply(v, img, train=False), ts,
                       num_body_points=K)


def run_eval(params, gts, loader, stats=None):
    ev = KeypointEvaluator(gts, K)
    variables = {"params": params,
                 "batch_stats": state.batch_stats if stats is None else stats}
    for b in loader:
        scores, labels, kpts = eval_fn(variables,
                                       jnp.asarray(b["images"], jnp.float32),
                                       jnp.asarray(b["orig_sizes"], jnp.float32))
        jax.block_until_ready(scores)
        scores, kpts = np.asarray(scores), np.asarray(kpts)
        for j, img_id in enumerate(b["image_ids"]):
            ev.update(int(img_id), scores[j], kpts[j])
    ev.accumulate()
    return ev.summarize()


stats = run_eval(state.params, val_gts, vloader)
print("AP (regular):", json.dumps({k: round(v, 4) for k, v in stats.items()}))
if state.ema is not None:
    stats_ema = run_eval(state.ema["params"], val_gts, vloader,
                         state.ema.get("batch_stats"))
    print("AP (ema):    ",
          json.dumps({k: round(v, 4) for k, v in stats_ema.items()}))

# ---- generalization: fresh UNSEEN drawn images from the same distribution
h_dir, h_ann = make_tiny_coco("/tmp/synth_holdout", n_images=64, w=RES, h=RES,
                              people=2, seed=123, draw=True, structured=True)
hds = CocoKeypointDataset(h_dir, h_ann, K, train=False,
                          transforms=EvalTransforms(out_size=RES))
h_gts = build_gts(hds)
hloader = KeypointLoader(hds, batch_size=8, num_keypoints=K, train=False,
                         with_cdn=False, drop_last=False)

h_stats = run_eval(state.params, h_gts, hloader)
print("AP (held-out, regular):",
      json.dumps({k: round(v, 4) for k, v in h_stats.items()}))
best_train, best_hold = stats, h_stats
if state.ema is not None:
    h_ema = run_eval(state.ema["params"], h_gts, hloader,
                     state.ema.get("batch_stats"))
    print("AP (held-out, ema):    ",
          json.dumps({k: round(v, 4) for k, v in h_ema.items()}))
    if stats_ema["AP"] > best_train["AP"]:
        best_train, best_hold = stats_ema, h_ema
print("VERDICT:", "LEARNS" if best_train["AP"] > 0.3 else "WEAK",
      f"(train AP={best_train['AP']:.3f}, held-out AP={best_hold['AP']:.3f}, "
      f"loss {curve[0][1]:.1f} -> {curve[-1][1]:.1f})")

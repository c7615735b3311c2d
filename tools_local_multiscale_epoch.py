"""Characterize the reference's ACTUAL multi-scale training recipe on the TPU
(VERDICT round-3 weak #5): base 640, base_size_repeat 4 -> 11 distinct scale
buckets (480..800 step 32), each a separate XLA program.

Records, per epoch: number of distinct programs encountered, wall, and the
steady-state step_ms (which now excludes every mid-epoch compile). Also
measures Trainer.prewarm_multiscale() — compiling all buckets up front.
Not part of the package; a one-off probe. Run: python tools_local_multiscale_epoch.py [size]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

from detrpose_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from synth_data import make_tiny_coco
from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.data.coco import CocoKeypointDataset
from detrpose_tpu.data.transforms import TrainTransforms
from detrpose_tpu.data.loader import KeypointLoader, generate_scales
from detrpose_tpu.train.trainer import Trainer

size = sys.argv[1] if len(sys.argv) > 1 else "n"
BS = 8
# enough batches that every one of the 11 scales is drawn w.h.p.
N_IMG = BS * 60

img_dir, ann = make_tiny_coco("/tmp/synth_ms640", n_images=N_IMG, w=640, h=640)
K = 17
mcfg = model_config(size, dtype=jnp.bfloat16)
model = build_model(mcfg)
tds = CocoKeypointDataset(
    img_dir, ann, K, train=True,
    transforms=TrainTransforms(out_size=640, num_keypoints=K,
                               policy_epochs=(99, 100, 101)))
loader = KeypointLoader(tds, BS, K, train=True, base_size=640,
                        base_size_repeat=4,  # the reference L/S/M/X recipe
                        num_queries=mcfg.num_queries)
print(f"scale buckets: {sorted(set(generate_scales(640, 4)))}")

trainer = Trainer(model, mcfg, train_loader=loader,
                  output_dir="/tmp/ms_epoch_out", tensorboard=False,
                  prewarm_scales=False)

t0 = time.perf_counter()
warmed = trainer.prewarm_multiscale()
t_warm = time.perf_counter() - t0
print(f"prewarm: {warmed} programs in {t_warm:.1f}s "
      f"({t_warm / max(warmed, 1):.1f}s each incl. persistent-cache hits)")

for epoch in range(2):
    t0 = time.perf_counter()
    stats = trainer.train_one_epoch(epoch, print_freq=100, nan_check_freq=0)
    print(f"epoch {epoch}: programs={stats.get('compile_programs')} "
          f"step_ms={stats.get('step_ms', float('nan')):.1f} "
          f"epoch_s={stats['epoch_s']:.1f} "
          f"loss={stats.get('loss_total', float('nan')):.2f}")

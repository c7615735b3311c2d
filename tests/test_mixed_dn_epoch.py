"""Regression: an epoch mixing dn and no-dn batches must not crash.

`build_cdn` returns None for a batch with zero valid GT (cdn.py:74-75, e.g.
an unannotated image or an augmentation that dropped every instance), so the
loader yields batches WITHOUT the "dn" key mid-epoch (loader.py:218-222).
The trainer's device-side metric accumulator stacks one vector per metric
structure; dn batches carry extra `*_dn_*` loss keys, so a single stacked
accumulator would hit a broadcast shape error (round-3 review finding).
"""
import numpy as np
import pytest

from detrpose_tpu.configs import build_model, model_config
from detrpose_tpu.train.cdn import build_cdn
from detrpose_tpu.train.trainer import Trainer

HW, K = 64, 17
# Config-shrunk N (same knobs as test_grad_accum): compiles in seconds.
_TOY = dict(num_decoder_layers=1, hidden_dim=64, enc_dim_feedforward=128,
            dec_dim_feedforward=128, num_queries=12, dec_n_points=2)


def _targets(rng, B=2, G=3, valid=True):
    kxy = rng.uniform(0.2, 0.8, (B, G, K, 2)).astype(np.float32)
    return {
        "labels": np.zeros((B, G), np.int32),
        "boxes": np.concatenate(
            [kxy.mean(2), np.full((B, G, 2), 0.25, np.float32)], -1),
        "keypoints": np.concatenate(
            [kxy.reshape(B, G, 2 * K), np.ones((B, G, K), np.float32)], -1),
        "area": np.full((B, G), 0.05, np.float32),
        "valid": np.full((B, G), valid, bool),
    }


class _ListLoader:
    def __init__(self, batches):
        self._batches = batches

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return len(self._batches)

    def __iter__(self):
        return iter(list(self._batches))


@pytest.mark.slow
def test_epoch_mixing_dn_and_nodn_batches():
    rng = np.random.default_rng(0)
    cfg = model_config("n", **_TOY)
    model = build_model(cfg)
    images = rng.uniform(0, 1, (2, HW, HW, 3)).astype(np.float32)

    t_dn = _targets(rng, valid=True)
    dn = build_cdn(t_dn, cfg.num_queries, K, (HW, HW), rng)
    assert dn is not None
    t_no = _targets(rng, valid=False)
    assert build_cdn(t_no, cfg.num_queries, K, (HW, HW), rng) is None

    batches = [{"images": images, "targets": t_dn, "dn": dn},
               {"images": images, "targets": t_no},
               {"images": images, "targets": t_dn, "dn": dn}]
    trainer = Trainer(model, cfg, train_loader=_ListLoader(batches),
                      tensorboard=False, n_devices=1, epochs=1)
    out = trainer.train_one_epoch(0, nan_check_freq=0)

    assert np.isfinite(out["loss_total"])
    dn_keys = [k for k in out if "_dn_" in k]
    assert dn_keys, f"dn loss terms missing from epoch means: {sorted(out)}"
    assert all(np.isfinite(out[k]) for k in dn_keys)


@pytest.mark.slow
def test_multiscale_epoch_timer_and_prewarm():
    """Multi-scale epochs: the steady-state timer excludes every mid-epoch
    new-scale compile (round-3 weak #5: it used to assume compiles only at
    steps 1-2), and prewarm_multiscale() compiles each scale bucket up front
    so no compile lands inside an epoch at all."""
    rng = np.random.default_rng(1)
    cfg = model_config("n", **_TOY)
    model = build_model(cfg)

    def mk_batch(hw):
        images = rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32)
        t = _targets(rng, valid=True)
        dn = build_cdn(t, cfg.num_queries, K, (hw, hw), rng)
        return {"images": images, "targets": t, "dn": dn}

    scales = [64, 96]  # must be stride-32 divisible
    # scale switch mid-epoch: 3 steps at 64, then 3 at 96
    batches = [mk_batch(64)] * 3 + [mk_batch(96)] * 3

    class _ScaledLoader(_ListLoader):
        pass

    loader = _ScaledLoader(batches)
    loader.scales = scales
    trainer = Trainer(model, cfg, train_loader=loader,
                      tensorboard=False, n_devices=1, epochs=1)

    warmed = trainer.prewarm_multiscale()
    assert warmed == len(scales)

    out = trainer.train_one_epoch(0, nan_check_freq=0)
    assert np.isfinite(out["loss_total"])
    # both scale programs were encountered and tracked
    assert out["compile_programs"] == 2.0
    # prewarm marked both scale programs as seen, so the only fresh steps are
    # 0 and 1 (the eager metric stack/accum jits compiling on first use):
    # 6 steps, 2 fresh -> 4 steady steps, including the mid-epoch 64->96
    # scale switch at step 3
    assert "step_ms" in out and out["step_ms"] > 0
    assert out["steady_steps"] == 4.0

    # epoch 2: accum jits are warm, every program compiled -> zero exclusions
    out2 = trainer.train_one_epoch(1, nan_check_freq=0)
    assert out2["steady_steps"] == 6.0

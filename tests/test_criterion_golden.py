"""Golden test: our padded-target criterion vs the reference Criterion on the
same fabricated outputs/targets, with the same (scipy) matching.

The reference criterion imports dist_utils -> data.dataloader -> torchvision;
torchvision is absent here, so we stub it (only its import is touched on this
code path).
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from detrpose_tpu.train.criterion import criterion as our_criterion

from ref_loader import _ns_pkg, REF

K = 17
C = 2


def _load_ref_criterion():
    # shared torchvision stub (ref_loader) — the per-test variants used to
    # shadow each other depending on test order
    import ref_loader

    ref_loader.install_torchvision_stub()
    _ns_pkg("refsrc", f"{REF}/src")
    _ns_pkg("refsrc.models", f"{REF}/src/models")
    _ns_pkg("refsrc.models.detrpose", f"{REF}/src/models/detrpose")
    _ns_pkg("refsrc.misc", f"{REF}/src/misc")
    _ns_pkg("refsrc.data", f"{REF}/src/data")
    import importlib

    crit = importlib.import_module("refsrc.models.detrpose.criterion")
    matcher = importlib.import_module("refsrc.models.detrpose.matcher")
    return crit, matcher


def test_criterion_matches_reference():
    crit_mod, matcher_mod = _load_ref_criterion()

    rng = np.random.default_rng(0)
    B, nq, L = 2, 12, 3  # final + 2 aux layers
    counts = [3, 2]
    G = max(counts)

    def mk_level():
        return {
            "pred_logits": rng.standard_normal((B, nq, C)).astype(np.float32),
            "pred_keypoints": rng.uniform(0, 1, (B, nq, 2 * K)).astype(np.float32),
        }

    levels = [mk_level() for _ in range(L)]           # [aux0, aux1, final]
    pre = mk_level()
    interm = mk_level()

    # targets
    t_np = {
        "labels": np.zeros((B, G), np.int32),
        "keypoints": np.zeros((B, G, 3 * K), np.float32),
        "area": np.full((B, G), 1.0, np.float32),
        "valid": np.zeros((B, G), bool),
    }
    t_torch = []
    for b in range(B):
        n = counts[b]
        kp = rng.uniform(0.1, 0.9, (n, 2 * K)).astype(np.float32)
        vis = (rng.uniform(size=(n, K)) > 0.2).astype(np.float32)
        area = rng.uniform(0.02, 0.2, (n,)).astype(np.float32)
        t_np["keypoints"][b, :n] = np.concatenate([kp, vis], -1)
        t_np["area"][b, :n] = area
        t_np["valid"][b, :n] = True
        t_torch.append({
            "labels": torch.zeros(n, dtype=torch.long),
            "keypoints": torch.from_numpy(np.concatenate([kp, vis], -1)),
            "area": torch.from_numpy(area),
            "boxes": torch.zeros(n, 4),
        })

    # ---- reference
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_keypoints=10.0, cost_oks=4.0, focal_alpha=0.25,
        num_body_points=K)
    ref_crit = crit_mod.Criterion(
        num_classes=C, matcher=matcher,
        weight_dict={"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0},
        losses=["vfl", "keypoints"], num_body_points=K)

    def tt(x):
        return torch.from_numpy(np.asarray(x))

    outputs_t = {
        "pred_logits": tt(levels[-1]["pred_logits"]),
        "pred_keypoints": tt(levels[-1]["pred_keypoints"]),
        "up": torch.tensor([0.5]), "reg_scale": torch.tensor([4.0]), "reg_max": 32,
        "aux_outputs": [
            {"pred_logits": tt(l["pred_logits"]),
             "pred_keypoints": tt(l["pred_keypoints"])} for l in levels[:-1]
        ],
        "aux_pre_outputs": {"pred_logits": tt(pre["pred_logits"]),
                            "pred_keypoints": tt(pre["pred_keypoints"])},
        "aux_interm_outputs": [{"pred_logits": tt(interm["pred_logits"]),
                                "pred_keypoints": tt(interm["pred_keypoints"])}],
    }
    with torch.no_grad():
        ref_losses = ref_crit(outputs_t, t_torch)

    # ---- ours (scipy matcher backend for exact assignment parity)
    outputs_j = {
        "pred_logits": jnp.asarray(levels[-1]["pred_logits"]),
        "pred_keypoints": jnp.asarray(levels[-1]["pred_keypoints"]),
        "aux_outputs": [
            {"pred_logits": jnp.asarray(l["pred_logits"]),
             "pred_keypoints": jnp.asarray(l["pred_keypoints"])}
            for l in levels[:-1]
        ],
        "aux_pre_outputs": {"pred_logits": jnp.asarray(pre["pred_logits"]),
                            "pred_keypoints": jnp.asarray(pre["pred_keypoints"])},
        "aux_interm_outputs": [{"pred_logits": jnp.asarray(interm["pred_logits"]),
                                "pred_keypoints": jnp.asarray(interm["pred_keypoints"])}],
    }
    targets_j = {k: jnp.asarray(v) for k, v in t_np.items()}
    our_losses = our_criterion(outputs_j, targets_j, K, C,
                               matcher_backend="scipy")

    # name mapping is identical; compare every common key
    common = sorted(set(ref_losses) & set(our_losses))
    assert len(common) >= 3 * (L + 2) - 2, (sorted(ref_losses), sorted(our_losses))
    for k in common:
        ref_v = float(ref_losses[k])
        our_v = float(our_losses[k])
        assert ref_v == pytest.approx(our_v, rel=1e-3, abs=1e-4), (
            f"{k}: ref {ref_v} vs ours {our_v}")

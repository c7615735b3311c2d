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


@pytest.mark.parametrize("K", [17, 14])
def test_criterion_matches_reference(K):
    """K=17 is the COCO head; K=14 exercises the CrowdPose branch (14-entry
    OKS sigma table in matcher/criterion, K-parameterized reshapes —
    reference swaps num_body_points, detrpose_hgnetv2_l_crowdpose.py:41-44).
    Both values AND input gradients are compared (the matcher assignment is
    non-differentiable and identical on both sides by construction)."""
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
        t = torch.from_numpy(np.asarray(x).copy())
        t.requires_grad_(True)
        return t

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

    # gradients of the sum over common terms, both sides
    total_t = sum(ref_losses[k] for k in common)
    total_t.backward()

    def total_loss(ov):
        losses = our_criterion(ov, targets_j, K, C, matcher_backend="scipy")
        return sum(losses[k].astype(jnp.float32) for k in common)

    total_j, d_out_j = jax.value_and_grad(total_loss)(outputs_j)
    assert float(total_t) == pytest.approx(float(total_j), rel=1e-3)

    # gradient parity on every prediction input (mirrored structure, no
    # reliance on pytree leaf order)
    def cmp(name, t_tensor, j_grad):
        g_t = (t_tensor.grad.detach().numpy() if t_tensor.grad is not None
               else np.zeros(tuple(t_tensor.shape), np.float32))
        g_j = np.asarray(j_grad, np.float32)
        denom = max(np.abs(g_t).max(), 1e-6)
        np.testing.assert_allclose(
            g_j, g_t, rtol=0, atol=2e-4 * denom, err_msg=f"grad {name}")

    cmp("pred_logits", outputs_t["pred_logits"], d_out_j["pred_logits"])
    cmp("pred_keypoints", outputs_t["pred_keypoints"],
        d_out_j["pred_keypoints"])
    for i in range(L - 1):
        cmp(f"aux{i}.logits", outputs_t["aux_outputs"][i]["pred_logits"],
            d_out_j["aux_outputs"][i]["pred_logits"])
        cmp(f"aux{i}.kpts", outputs_t["aux_outputs"][i]["pred_keypoints"],
            d_out_j["aux_outputs"][i]["pred_keypoints"])
    cmp("pre.logits", outputs_t["aux_pre_outputs"]["pred_logits"],
        d_out_j["aux_pre_outputs"]["pred_logits"])
    cmp("pre.kpts", outputs_t["aux_pre_outputs"]["pred_keypoints"],
        d_out_j["aux_pre_outputs"]["pred_keypoints"])
    cmp("interm.logits", outputs_t["aux_interm_outputs"][0]["pred_logits"],
        d_out_j["aux_interm_outputs"][0]["pred_logits"])
    cmp("interm.kpts", outputs_t["aux_interm_outputs"][0]["pred_keypoints"],
        d_out_j["aux_interm_outputs"][0]["pred_keypoints"])

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


@pytest.mark.slow
@pytest.mark.parametrize("K", [17, 14])
def test_optional_losses_match_reference(K, monkeypatch):
    """Golden for every loss the config system can enable —
    labels/mal/local on top of the shipped vfl/keypoints — over final, aux,
    pre, interm AND DN branches (reference criterion.py:38-198, 285-435).
    Values and input gradients, with the same (scipy) matching.

    loss_local specifics pinned here: union (go) indices drive the mask/OKS
    weights, the final real output has no teacher_corners so it contributes
    no loss_dfl, DN branches reuse the num_pos/num_neg cached from the real
    branches (the reference's "is_dn" gate, criterion.py:185-192)."""
    import torch as _torch

    # reference prep_for_dn index fabrication hard-codes .cuda()
    monkeypatch.setattr(_torch.Tensor, "cuda", lambda self, *a, **k: self)

    crit_mod, matcher_mod = _load_ref_criterion()

    rng = np.random.default_rng(42)
    B, nq, L, R = 2, 12, 3, 8
    counts = [3, 2]
    G = max(counts)
    # DN layout: groups=2, single_pad(max_known)=3 -> pad_size 12 == pad_cap
    groups, single = 2, max(counts)
    pad = groups * 2 * single

    def mk_level(n, corners=True):
        d = {
            "pred_logits": rng.standard_normal((B, n, C)).astype(np.float32),
            "pred_keypoints": rng.uniform(0, 1, (B, n, 2 * K)).astype(np.float32),
        }
        if corners:
            d["pred_corners"] = rng.standard_normal(
                (B, n, K, 2 * (R + 1))).astype(np.float32)
        return d

    levels = [mk_level(nq) for _ in range(L)]
    pre = mk_level(nq, corners=False)
    interm = mk_level(nq, corners=False)
    dn_levels = [mk_level(pad) for _ in range(L)]
    dn_pre = mk_level(pad, corners=False)

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

    LOSSES = ["labels", "vfl", "mal", "keypoints", "local"]
    WD = {"loss_ce": 1.0, "loss_vfl": 2.0, "loss_mal": 1.5,
          "loss_keypoints": 10.0, "loss_oks": 4.0, "loss_dfl": 0.5}

    # ---- reference
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_keypoints=10.0, cost_oks=4.0, focal_alpha=0.25,
        num_body_points=K)
    ref_crit = crit_mod.Criterion(
        num_classes=C, matcher=matcher, weight_dict=WD,
        losses=LOSSES, num_body_points=K)

    def tt(x):
        t = torch.from_numpy(np.asarray(x).copy())
        t.requires_grad_(True)
        return t

    def t_branch(lv, teacher=None):
        d = {"pred_logits": tt(lv["pred_logits"]),
             "pred_keypoints": tt(lv["pred_keypoints"])}
        if "pred_corners" in lv:
            d["pred_corners"] = tt(lv["pred_corners"])
        if teacher is not None:
            d["teacher_corners"] = teacher["pred_corners"]
            d["teacher_logits"] = teacher["pred_logits"]
        return d

    final_t = t_branch(levels[-1])
    dn_final_t = t_branch(dn_levels[-1])
    outputs_t = {
        **final_t,
        "up": torch.tensor([0.5]), "reg_scale": torch.tensor([4.0]),
        "reg_max": R,
        "aux_outputs": [t_branch(l, teacher=final_t) for l in levels[:-1]],
        "aux_pre_outputs": t_branch(pre),
        "aux_interm_outputs": [t_branch(interm)],
        "dn_aux_outputs": [t_branch(l, teacher=dn_final_t) for l in dn_levels[:-1]]
                          + [dict(dn_final_t,
                                  teacher_corners=dn_final_t["pred_corners"],
                                  teacher_logits=dn_final_t["pred_logits"])],
        "dn_aux_pre_outputs": t_branch(dn_pre),
        "dn_meta": {"pad_size": pad, "num_dn_group": groups},
    }
    ref_losses = ref_crit(outputs_t, t_torch)

    # ---- ours
    def j_branch(lv, teacher=None):
        d = {"pred_logits": jnp.asarray(lv["pred_logits"]),
             "pred_keypoints": jnp.asarray(lv["pred_keypoints"])}
        if "pred_corners" in lv:
            d["pred_corners"] = jnp.asarray(lv["pred_corners"])
        if teacher is not None:
            d["teacher_corners"] = jnp.asarray(teacher["pred_corners"])
            d["teacher_logits"] = jnp.asarray(teacher["pred_logits"])
        return d

    dn_final_j = j_branch(dn_levels[-1])
    outputs_j = {
        **j_branch(levels[-1]),
        "aux_outputs": [j_branch(l, teacher=levels[-1]) for l in levels[:-1]],
        "aux_pre_outputs": j_branch(pre),
        "aux_interm_outputs": [j_branch(interm)],
        "dn_aux_outputs": [j_branch(l, teacher=dn_levels[-1])
                           for l in dn_levels[:-1]]
                          + [dict(dn_final_j,
                                  teacher_corners=dn_final_j["pred_corners"],
                                  teacher_logits=dn_final_j["pred_logits"])],
        "dn_aux_pre_outputs": j_branch(dn_pre),
    }
    # fabricated DN matches (positives at the head of each group)
    mq = np.zeros((B, pad), np.int32)
    mg = np.zeros((B, pad), np.int32)
    mv = np.zeros((B, pad), bool)
    for b in range(B):
        k = 0
        for g in range(groups):
            for t in range(counts[b]):
                mq[b, k] = g * 2 * single + t
                mg[b, k] = t
                mv[b, k] = True
                k += 1
    targets_j = {k: jnp.asarray(v) for k, v in t_np.items()}
    targets_j["dn_match"] = {
        "query_idx": jnp.asarray(mq), "gt_idx": jnp.asarray(mg),
        "valid": jnp.asarray(mv), "num_group": jnp.float32(groups),
        "active_mask": jnp.ones((pad,), bool),
    }

    def run_ours(ov):
        return our_criterion(ov, targets_j, K, C, weight_dict=WD,
                             matcher_backend="scipy", losses=tuple(LOSSES))

    our_losses = run_ours(outputs_j)

    common = sorted(set(ref_losses) & set(our_losses))
    # every enabled loss over every branch family must appear on both sides
    fams = ["loss_ce", "loss_vfl", "loss_mal", "loss_keypoints", "loss_oks"]
    for fam in fams:
        for sfx in ["", "_0", "_pre", "_enc_0", "_dn_0", "_dn_pre"]:
            assert fam + sfx in common, (fam + sfx, sorted(ref_losses),
                                         sorted(our_losses))
    for sfx in ["_0", "_1", "_dn_0", "_dn_2"]:
        assert "loss_dfl" + sfx in common, sorted(common)
    assert "loss_dfl" not in common  # final real output has no teacher

    for k in common:
        ref_v = float(ref_losses[k])
        our_v = float(our_losses[k])
        assert ref_v == pytest.approx(our_v, rel=2e-3, abs=1e-4), (
            f"{k}: ref {ref_v} vs ours {our_v}")

    # gradient parity of the total over common terms
    total_t = sum(ref_losses[k] for k in common)
    total_t.backward()

    def total_loss(ov):
        losses = run_ours(ov)
        return sum(losses[k].astype(jnp.float32) for k in common)

    total_j, d_out_j = jax.value_and_grad(total_loss)(outputs_j)
    assert float(total_t) == pytest.approx(float(total_j), rel=1e-3)

    def cmp(name, t_tensor, j_grad):
        g_t = (t_tensor.grad.detach().numpy() if t_tensor.grad is not None
               else np.zeros(tuple(t_tensor.shape), np.float32))
        g_j = np.asarray(j_grad, np.float32)
        denom = max(np.abs(g_t).max(), 1e-6)
        np.testing.assert_allclose(
            g_j, g_t, rtol=0, atol=3e-4 * denom, err_msg=f"grad {name}")

    cmp("pred_logits", outputs_t["pred_logits"], d_out_j["pred_logits"])
    cmp("pred_keypoints", outputs_t["pred_keypoints"],
        d_out_j["pred_keypoints"])
    cmp("pred_corners(final)", outputs_t["pred_corners"],
        d_out_j["pred_corners"])
    for i in range(L - 1):
        for key in ["pred_logits", "pred_keypoints", "pred_corners"]:
            cmp(f"aux{i}.{key}", outputs_t["aux_outputs"][i][key],
                d_out_j["aux_outputs"][i][key])
        for key in ["pred_logits", "pred_keypoints", "pred_corners"]:
            cmp(f"dn{i}.{key}", outputs_t["dn_aux_outputs"][i][key],
                d_out_j["dn_aux_outputs"][i][key])
    cmp("dn_final.logits", outputs_t["dn_aux_outputs"][-1]["pred_logits"],
        d_out_j["dn_aux_outputs"][-1]["pred_logits"])
    cmp("dn_final.corners", outputs_t["dn_aux_outputs"][-1]["pred_corners"],
        d_out_j["dn_aux_outputs"][-1]["pred_corners"])
    cmp("dn_pre.logits", outputs_t["dn_aux_pre_outputs"]["pred_logits"],
        d_out_j["dn_aux_pre_outputs"]["pred_logits"])

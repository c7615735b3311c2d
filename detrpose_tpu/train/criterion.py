"""Training criterion: Hungarian-matched VFL + L1 + OKS losses with deep
supervision, on batched/padded targets (TPU-first; no ragged python loops).

Reference semantics: src/models/detrpose/criterion.py. Loss math matches:
  * loss_vfl (criterion.py:58-93): varifocal BCE where the positive target is
    the detached OKS of the matched prediction.
  * loss_keypoints (criterion.py:200-229): visibility-masked L1 + (1-OKS),
    computed at the union ("go") matching across all decoder layers
    (criterion.py:247-268).
  * per-level matching for vfl, union matching for keypoints, DN branch with
    fabricated positive indices (criterion.py:385-430).

Normalization: the reference all-reduces num_boxes across ranks
(criterion.py:317-323). Here losses are computed over the *global* batch under
pjit, so jnp.sum over the sharded batch axis IS the all-reduce — numerically
identical to DDP's mean-of-rank-losses.

Targets layout: labels (B,G) int32, keypoints (B,G,3K) xyxy..vv normalized,
area (B,G) normalized, valid (B,G) bool — valid entries first.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .matcher import hungarian_match
from ..ops.oks import keypoint_sigmas

DEFAULT_WEIGHTS = {"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0}


def _pair_oks(zp, zg, vg, area, K):
    """OKS for aligned pairs. zp/zg (..., 2K), vg (..., K), area (...)."""
    sig = jnp.asarray(keypoint_sigmas(K))
    var = (2.0 * sig) ** 2
    kp = zp.reshape(zp.shape[:-1] + (K, 2)).astype(jnp.float32)
    kg = zg.reshape(zg.shape[:-1] + (K, 2)).astype(jnp.float32)
    d2 = (kp[..., 0] - kg[..., 0]) ** 2 + (kp[..., 1] - kg[..., 1]) ** 2
    e = d2 / (area[..., None] * var * 2.0)
    sim = jnp.exp(-e) * vg
    return sim.sum(-1) / (vg.sum(-1) + 1e-6)


def _scatter_to_queries(assign_q, valid, values, nq, fill):
    """Scatter per-GT values to a (B, nq) per-query array (fill elsewhere).

    assign_q: (B, G) query index per GT; valid: (B, G); values: (B, G).
    """
    B, G = assign_q.shape
    safe_q = jnp.where(valid, assign_q, nq)  # dump slot
    out = jnp.full((B, nq + 1), fill, values.dtype)
    bidx = jnp.arange(B)[:, None]
    out = out.at[bidx, safe_q].set(values.astype(out.dtype))
    return out[:, :nq]


def loss_vfl(outputs, targets, assign_q, num_boxes, K, num_classes=2,
             focal_alpha=0.25, gamma=2.0, query_mask=None):
    """Varifocal loss (criterion.py:58-93). ``query_mask`` (nq,) drops inert
    static-capacity DN slots that don't exist in the reference."""
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, nq, C)
    B, nq, C = logits.shape
    valid = targets["valid"]

    # detached OKS of the matched predictions
    zp_all = outputs["pred_keypoints"][..., : 2 * K]
    bidx = jnp.arange(B)[:, None]
    zp = zp_all[bidx, jnp.where(valid, assign_q, 0)]           # (B, G, 2K)
    zg = targets["keypoints"][..., : 2 * K]
    vg = targets["keypoints"][..., 2 * K:]
    oks = _pair_oks(zp, zg, vg, targets["area"], K)
    oks = jnp.clip(oks, 1e-6, None)
    oks = jax.lax.stop_gradient(oks)

    tcls = _scatter_to_queries(assign_q, valid, targets["labels"], nq,
                               jnp.int32(num_classes))
    target = jax.nn.one_hot(tcls, num_classes + 1)[..., :-1]   # (B, nq, C)
    tscore = _scatter_to_queries(assign_q, valid, oks, nq, 0.0)
    target_score = tscore[..., None] * target

    pred_score = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    weight = focal_alpha * pred_score**gamma * (1 - target) + target_score

    bce = optax_sigmoid_bce(logits, target_score)
    # reference: loss.mean(1).sum() * nq / num_boxes == loss.sum() / num_boxes
    l = bce * weight
    if query_mask is not None:
        l = l * query_mask[None, :, None]
    return {"loss_vfl": l.sum() / num_boxes}


def optax_sigmoid_bce(logits, labels):
    """binary_cross_entropy_with_logits, element-wise (stable form)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def loss_labels(outputs, targets, assign_q, num_boxes, K, num_classes=2,
                focal_alpha=0.25, gamma=2.0, query_mask=None):
    """Plain sigmoid focal loss (criterion.py:38-56, utils.py:47-73).

    Reference normalization is loss.mean(1).sum()/num_boxes * nq — the nq
    cancels, so the elementwise sum keeps parity even when our static DN
    capacity (pad_cap) exceeds the reference's dynamic pad_size, as long as
    ``query_mask`` zeroes the inert slots."""
    logits = outputs["pred_logits"].astype(jnp.float32)
    B, nq, C = logits.shape
    tcls = _scatter_to_queries(assign_q, targets["valid"], targets["labels"], nq,
                               jnp.int32(num_classes))
    target = jax.nn.one_hot(tcls, num_classes + 1)[..., :-1]
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, target)
    p_t = p * target + (1 - p) * (1 - target)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = focal_alpha * target + (1 - focal_alpha) * (1 - target)
    loss = alpha_t * loss
    if query_mask is not None:
        loss = loss * query_mask[None, :, None]
    return {"loss_ce": loss.sum() / num_boxes}


def loss_mal(outputs, targets, assign_q, num_boxes, K, num_classes=2,
             mal_alpha=None, gamma=2.0, query_mask=None):
    """Matching-aware loss variant (criterion.py:95-135)."""
    logits = outputs["pred_logits"].astype(jnp.float32)
    B, nq, C = logits.shape
    valid = targets["valid"]
    zp_all = outputs["pred_keypoints"][..., : 2 * K]
    bidx = jnp.arange(B)[:, None]
    zp = zp_all[bidx, jnp.where(valid, assign_q, 0)]
    oks = _pair_oks(zp, targets["keypoints"][..., : 2 * K],
                    targets["keypoints"][..., 2 * K:], targets["area"], K)
    oks = jax.lax.stop_gradient(jnp.clip(oks, 1e-6, None))

    tcls = _scatter_to_queries(assign_q, valid, targets["labels"], nq,
                               jnp.int32(num_classes))
    target = jax.nn.one_hot(tcls, num_classes + 1)[..., :-1]
    tscore = _scatter_to_queries(assign_q, valid, oks, nq, 0.0)
    target_score = (tscore[..., None] * target) ** gamma
    pred_score = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    if mal_alpha is not None:
        weight = mal_alpha * pred_score**gamma * (1 - target) + target
    else:
        weight = pred_score**gamma * (1 - target) + target
    l = optax_sigmoid_bce(logits, target_score) * weight
    if query_mask is not None:
        l = l * query_mask[None, :, None]
    # reference: loss.mean(1).sum() * nq / num_boxes == loss.sum() / num_boxes
    return {"loss_mal": l.sum() / num_boxes}


def loss_local(outputs, targets, go_g, go_valid, K, T=5.0,
               num_pos_neg=None, query_mask=None):
    """FGL/DDF distillation of FDR corner distributions against the final
    layer's (teacher) distributions (criterion.py:137-198).

    ``num_pos_neg``: the reference caches self.num_pos/num_neg from the last
    non-DN branch (criterion.py:185-192 gate on "is_dn") and reuses them for
    the DN branches — pass the real-branch values there. ``query_mask`` (nq,)
    excludes inert static-capacity DN slots from both the positive/negative
    means and the counts (the reference has exactly pad_size slots)."""
    if "pred_corners" not in outputs or "teacher_corners" not in outputs:
        return {}
    pred = outputs["pred_corners"].astype(jnp.float32)     # (B, nq, K, 2*(R+1))
    teacher = outputs["teacher_corners"].astype(jnp.float32)
    B, nq = pred.shape[:2]
    nbins = pred.shape[-1] // 2
    pc = pred.reshape(B, nq, K * 2, nbins)
    tc = jax.lax.stop_gradient(teacher.reshape(B, nq, K * 2, nbins))

    # per-query weights: teacher max class prob; matched queries use OKS
    w = jnp.max(jax.nn.sigmoid(outputs["teacher_logits"].astype(jnp.float32)), -1)
    bidx = jnp.arange(B)[:, None]
    g_safe = jnp.where(go_valid, go_g, 0)
    zp = outputs["pred_keypoints"][..., : 2 * K]
    zg = targets["keypoints"][bidx, g_safe][..., : 2 * K]
    vg = targets["keypoints"][bidx, g_safe][..., 2 * K:]
    area = targets["area"][bidx, g_safe]
    oks = _pair_oks(zp, zg, vg, area, K)
    w = jnp.where(go_valid, oks, w)
    w = jax.lax.stop_gradient(w)[..., None]                # (B, nq, 1)

    logp = jax.nn.log_softmax(pc / T, axis=-1)
    q = jax.nn.softmax(tc / T, axis=-1)
    kl = (q * (jnp.log(q + 1e-12) - logp)).sum(-1)         # (B, nq, 2K)
    kl = kl * (T**2) * w

    pos = jnp.broadcast_to(go_valid[..., None], kl.shape)
    neg = ~pos
    if query_mask is not None:
        act = jnp.broadcast_to(query_mask[None, :, None], kl.shape)
        pos = pos & act
        neg = neg & act
    if num_pos_neg is None:
        batch_scale = 8.0 / B
        num_pos = jnp.sqrt(pos.sum() * batch_scale)
        num_neg = jnp.sqrt(neg.sum() * batch_scale)
    else:
        num_pos, num_neg = num_pos_neg
    l_pos = jnp.where(pos, kl, 0.0).sum() / jnp.clip(pos.sum(), 1)
    l_neg = jnp.where(neg, kl, 0.0).sum() / jnp.clip(neg.sum(), 1)
    return {"loss_dfl": (l_pos * num_pos + l_neg * num_neg) / (num_pos + num_neg + 1e-12)}


def loss_keypoints(outputs, targets, go_g, go_valid, num_boxes_go, K):
    """L1 + OKS losses at the union matching (criterion.py:200-229)."""
    zp = outputs["pred_keypoints"][..., : 2 * K].astype(jnp.float32)  # (B, nq, 2K)
    B, nq, _ = zp.shape
    g_safe = jnp.where(go_valid, go_g, 0)
    bidx = jnp.arange(B)[:, None]
    zg = targets["keypoints"][bidx, g_safe][..., : 2 * K]
    vg = targets["keypoints"][bidx, g_safe][..., 2 * K:]
    area = targets["area"][bidx, g_safe]

    v2 = jnp.repeat(vg, 2, axis=-1)
    l1 = jnp.abs(zp - zg) * v2 * go_valid[..., None]
    oks = _pair_oks(zp, zg, vg, area, K)
    oks_l = (1.0 - jnp.clip(oks, 1e-6, None)) * go_valid

    return {
        "loss_keypoints": l1.sum() / num_boxes_go,
        "loss_oks": oks_l.sum() / num_boxes_go,
    }


def union_indices(assignments, valid, nq):
    """Union ("global optimal") matching across decoder layers.

    Reference semantics (criterion.py:247-268): pool all layers' (query, gt)
    pairs; each query keeps the gt it was matched to most often.

    Args:
      assignments: list of (B, G) per-layer assign_q arrays.
      valid: (B, G).
    Returns:
      go_g (B, nq) int32 gt index per query, go_valid (B, nq) bool.
    """
    B, G = assignments[0].shape
    counts = jnp.zeros((B, nq + 1, G), jnp.int32)
    bidx = jnp.arange(B)[:, None]
    gidx = jnp.arange(G)[None, :]
    for a in assignments:
        safe_q = jnp.where(valid, a, nq)
        counts = counts.at[bidx, safe_q, gidx].add(1)
    counts = counts[:, :nq]                       # (B, nq, G)
    go_g = jnp.argmax(counts, axis=2).astype(jnp.int32)
    go_valid = jnp.max(counts, axis=2) > 0
    return go_g, go_valid


def criterion(
    outputs: Dict[str, Any],
    targets: Dict[str, jax.Array],
    num_body_points: int,
    num_classes: int = 2,
    weight_dict: Optional[Dict[str, float]] = None,
    matcher_backend: str = "auction",
    matcher_weights=(2.0, 10.0, 4.0),
    losses=("vfl", "keypoints"),
) -> Dict[str, jax.Array]:
    """Full training loss over final/aux/pre/interm/dn outputs.

    Returns dict of weighted losses; total = sum of values.
    """
    K = num_body_points
    wd = dict(DEFAULT_WEIGHTS if weight_dict is None else weight_dict)
    cc, ck, co = matcher_weights
    valid = targets["valid"]
    nq = outputs["pred_logits"].shape[1]

    # per-level matchings: ONE vmapped matcher instance over all supervision
    # levels (final + aux + pre + interm share target set and query count) —
    # the reference runs ~10 independent matcher calls per step
    # (criterion.py:254-258); unrolling those as separate XLA subprograms
    # multiplies compile time for zero runtime benefit.
    aux_list = outputs.get("aux_outputs", [])
    interm_list = outputs.get("aux_interm_outputs", [])
    branches = [outputs] + list(aux_list) + [outputs["aux_pre_outputs"]] + list(interm_list)
    st_logits = jnp.stack([b["pred_logits"] for b in branches])
    st_kpts = jnp.stack([b["pred_keypoints"][..., : 2 * K] for b in branches])
    assign_all = jax.vmap(
        lambda lg, kp: hungarian_match(
            lg, kp, targets, K, cost_class=cc, cost_keypoints=ck,
            cost_oks=co, backend=matcher_backend)
    )(st_logits, st_kpts)                                 # (M, B, G)

    n_aux = len(aux_list)
    idx_final = assign_all[0]
    idx_aux = [assign_all[1 + i] for i in range(n_aux)]
    idx_pre = assign_all[1 + n_aux]
    idx_interm = [assign_all[2 + n_aux + i] for i in range(len(interm_list))]

    all_assign = [idx_final] + idx_aux + [idx_pre] + idx_interm
    go_g, go_valid = union_indices(all_assign, valid, nq)

    num_boxes = jnp.clip(valid.sum().astype(jnp.float32), 1.0, None)
    num_boxes_go = jnp.clip(go_valid.sum().astype(jnp.float32), 1.0, None)

    out_losses: Dict[str, jax.Array] = {}

    # Branch suffixes in stack order: final, aux_0..n-1, pre, enc_0..m-1.
    suffixes = ([""] + [f"_{i}" for i in range(n_aux)] + ["_pre"]
                + [f"_enc_{i}" for i in range(len(interm_list))])

    # ONE vmapped loss instance over all supervision branches (the reference
    # loops python-side, criterion.py:335-382). Branch-independent inputs
    # (targets, union indices, normalizers) are closed over.
    def per_branch(lg, kp, assign_q):
        o = {"pred_logits": lg, "pred_keypoints": kp}
        l = {}
        if "vfl" in losses:
            l.update(loss_vfl(o, targets, assign_q, num_boxes, K, num_classes))
        if "labels" in losses:
            l.update(loss_labels(o, targets, assign_q, num_boxes, K, num_classes))
        if "mal" in losses:
            l.update(loss_mal(o, targets, assign_q, num_boxes, K, num_classes))
        if "keypoints" in losses:
            l.update(loss_keypoints(o, targets, go_g, go_valid, num_boxes_go, K))
        return l

    stacked_losses = jax.vmap(per_branch)(st_logits, st_kpts, assign_all)
    for k, v in stacked_losses.items():
        if k in wd:
            for m, sfx in enumerate(suffixes):
                out_losses[k + sfx] = v[m] * wd[k]

    # FGL/DDF distillation needs FDR corners (final + aux branches only; the
    # final output lacks teacher_corners so loss_local returns {} there, like
    # the reference's `"teacher_corners" in outputs` gate).
    real_num_pos_neg = None
    if "local" in losses:
        # the reference caches num_pos/num_neg from the real branches' go-mask
        # (criterion.py:185-192) and reuses them for DN; compute them once.
        n_pos_el = go_valid.sum() * (2 * K)
        n_tot_el = go_valid.size * (2 * K)
        batch_scale = 8.0 / go_valid.shape[0]
        real_num_pos_neg = (jnp.sqrt(n_pos_el * batch_scale),
                            jnp.sqrt((n_tot_el - n_pos_el) * batch_scale))
        for sfx, o in [("", outputs)] + [
                (f"_{i}", a) for i, a in enumerate(aux_list)]:
            for k, v in loss_local(o, targets, go_g, go_valid, K).items():
                if k in wd:
                    out_losses[k + sfx] = v * wd[k]

    # DN branch: fabricated positive indices from the CDN layout.
    if "dn_aux_outputs" in outputs and "dn_match" in targets:
        dn_q = targets["dn_match"]["query_idx"]      # (B, M)
        dn_valid = targets["dn_match"]["valid"]      # (B, M)
        dn_g = targets["dn_match"]["gt_idx"]         # (B, M)
        scalar = targets["dn_match"]["num_group"]    # scalar
        nb_dn = num_boxes * scalar

        # Build per-branch "targets view" reordered so column m corresponds to
        # gt_idx[m]; reuse the same loss fns with a remapped target set.
        dn_targets = {
            "labels": jnp.take_along_axis(targets["labels"], dn_g, axis=1),
            "keypoints": jnp.take_along_axis(
                targets["keypoints"], dn_g[..., None], axis=1),
            "area": jnp.take_along_axis(targets["area"], dn_g, axis=1),
            "valid": dn_valid,
        }
        nq_dn = outputs["dn_aux_outputs"][0]["pred_logits"].shape[1]
        dn_active = targets["dn_match"].get("active_mask")
        dn_go_g, dn_go_valid = union_indices([dn_q], dn_valid, nq_dn)
        nb_dn_go = jnp.clip(dn_valid.sum().astype(jnp.float32), 1.0, None)

        # ONE vmapped instance over the DN supervision branches, like the main
        # branches above (indices/targets are branch-independent).
        dn_branches = list(outputs["dn_aux_outputs"])
        dn_suffixes = [f"_dn_{i}" for i in range(len(dn_branches))]
        if "dn_aux_pre_outputs" in outputs:
            dn_branches.append(outputs["dn_aux_pre_outputs"])
            dn_suffixes.append("_dn_pre")
        dn_lg = jnp.stack([b["pred_logits"] for b in dn_branches])
        dn_kp = jnp.stack([b["pred_keypoints"][..., : 2 * K] for b in dn_branches])

        def per_dn_branch(lg, kp):
            o = {"pred_logits": lg, "pred_keypoints": kp}
            l = {}
            if "vfl" in losses:
                l.update(loss_vfl(o, dn_targets, dn_q, nb_dn, K, num_classes,
                                  query_mask=dn_active))
            if "labels" in losses:
                l.update(loss_labels(o, dn_targets, dn_q, nb_dn, K,
                                     num_classes, query_mask=dn_active))
            if "mal" in losses:
                l.update(loss_mal(o, dn_targets, dn_q, nb_dn, K, num_classes,
                                  query_mask=dn_active))
            if "keypoints" in losses:
                # reference normalizes DN keypoints by num_boxes*scalar
                # (criterion.py:412-414), identical to nb_dn
                l.update(loss_keypoints(o, dn_targets, dn_go_g, dn_go_valid,
                                        nb_dn_go, K))
            return l

        dn_stacked = jax.vmap(per_dn_branch)(dn_lg, dn_kp)
        for k, v in dn_stacked.items():
            if k in wd:
                for m, sfx in enumerate(dn_suffixes):
                    out_losses[k + sfx] = v[m] * wd[k]

        # DN distillation branches: DN indices for mask/OKS, but the cached
        # num_pos/num_neg from the REAL branches (reference "is_dn" gate).
        if "local" in losses:
            for m, (sfx, o) in enumerate(zip(dn_suffixes, dn_branches)):
                for k, v in loss_local(
                        o, dn_targets, dn_go_g, dn_go_valid, K,
                        num_pos_neg=real_num_pos_neg,
                        query_mask=dn_active).items():
                    if k in wd:
                        out_losses[k + sfx] = v * wd[k]

    return out_losses

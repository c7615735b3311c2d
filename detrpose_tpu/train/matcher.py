"""Hungarian matching, TPU-first.

Cost semantics match the reference HungarianMatcher exactly
(src/models/detrpose/matcher.py:46-97): focal class cost + visibility-weighted
L1 keypoint cost + (1 - OKS), weights (2, 10, 4) from the config.

The reference syncs to CPU every step for scipy LSAP (matcher.py:88-97). Here
the default assignment is an on-device epsilon-scaled auction solver (pure jnp,
jit/pjit-safe, no host callback); `backend='scipy'` reproduces the reference's
exact assignment via jax.pure_callback for parity runs.

Targets are batched/padded (TPU-first — no ragged python lists):
  labels: (B, G) int32;  keypoints: (B, G, 3K) xyxy..vv;  area: (B, G);
  valid:  (B, G) bool.
Output: assign_q (B, G) int32 — the query index matched to each GT (undefined
where ~valid).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.oks import keypoint_sigmas

BIG = 1e6


def match_cost(
    pred_logits: jax.Array,    # (B, nq, C)
    pred_keypoints: jax.Array,  # (B, nq, 2K)
    targets: Dict[str, jax.Array],
    num_body_points: int,
    cost_class: float = 2.0,
    cost_keypoints: float = 10.0,
    cost_oks: float = 4.0,
    focal_alpha: float = 0.25,
) -> jax.Array:
    """Batched (B, nq, G) matching cost; invalid GT columns get +BIG."""
    K = num_body_points
    gamma = 2.0
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))  # (B, nq, C)
    neg = (1 - focal_alpha) * p**gamma * (-jnp.log(1 - p + 1e-8))
    pos = focal_alpha * (1 - p) ** gamma * (-jnp.log(p + 1e-8))
    # cost_class[b, q, g] = (pos - neg)[b, q, labels[b, g]]
    labels = jnp.clip(targets["labels"], 0, p.shape[-1] - 1)
    c_class = jnp.take_along_axis(
        (pos - neg)[:, :, :], labels[:, None, :], axis=2
    )  # (B, nq, G)

    zp = pred_keypoints[..., : 2 * K].astype(jnp.float32)       # (B, nq, 2K)
    zg = targets["keypoints"][..., : 2 * K].astype(jnp.float32)  # (B, G, 2K)
    vg = targets["keypoints"][..., 2 * K:].astype(jnp.float32)   # (B, G, K)

    # L1 keypoint cost, visibility-masked per coordinate pair.
    v2 = jnp.repeat(vg, 2, axis=-1)  # (B, G, 2K)
    diff = jnp.abs(zp[:, :, None, :] - zg[:, None, :, :])  # (B, nq, G, 2K)
    c_kpt = (diff * v2[:, None]).sum(-1)

    # OKS cost.
    sig = jnp.asarray(keypoint_sigmas(K))
    var = (2.0 * sig) ** 2
    kp = zp.reshape(zp.shape[0], zp.shape[1], K, 2)
    kg = zg.reshape(zg.shape[0], zg.shape[1], K, 2)
    d2 = ((kp[:, :, None, :, 0] - kg[:, None, :, :, 0]) ** 2
          + (kp[:, :, None, :, 1] - kg[:, None, :, :, 1]) ** 2)  # (B, nq, G, K)
    e = d2 / (targets["area"][:, None, :, None] * var[None, None, None] * 2.0)
    oks = (jnp.exp(-e) * vg[:, None]).sum(-1) / (vg.sum(-1)[:, None] + 1e-6)
    c_oks = 1.0 - jnp.clip(oks, 1e-6, None)

    c = cost_class * c_class + cost_keypoints * c_kpt + cost_oks * c_oks
    return jnp.where(targets["valid"][:, None, :], c, BIG)


def auction_assign(cost: jax.Array, valid: jax.Array, iters: int = 120) -> jax.Array:
    """Approximate min-cost assignment via Jacobi auction with eps scaling.

    Args:
      cost: (B, nq, G) — columns (GT) bid for rows (queries).
      valid: (B, G) — which columns participate.
    Returns:
      assign_q: (B, G) int32, query index per GT (distinct within a batch elem).
    """
    B, nq, G = cost.shape
    value = -cost.astype(jnp.float32).transpose(0, 2, 1)  # (B, G, nq) higher=better
    value = jnp.where(valid[:, :, None], value, -BIG)
    scale = jnp.maximum(jnp.max(jnp.abs(jnp.where(jnp.abs(value) < BIG / 2, value, 0.0))), 1.0)

    def run_phase(carry, eps):
        price, owner = carry  # price (B, nq); owner (B, nq) int32 col idx or -1

        def body(i, c):
            price, owner = c
            # each column computes its current best query
            net = value - price[:, None, :]           # (B, G, nq)
            best = jnp.argmax(net, axis=2)            # (B, G)
            best_v = jnp.max(net, axis=2)
            second_v = jnp.max(
                jnp.where(jax.nn.one_hot(best, nq, dtype=bool), -jnp.inf, net), axis=2)
            bid = best_v - second_v + eps              # (B, G)
            # column g is "unhappy" if it doesn't own its best query
            owns = owner[jnp.arange(B)[:, None], best] == jnp.arange(G)[None, :]
            active = valid & ~owns
            # highest bid per query wins (resolve ties by lowest column idx)
            bid_mat = jnp.where(
                active[:, :, None] & jax.nn.one_hot(best, nq, dtype=bool),
                bid[:, :, None], -jnp.inf)             # (B, G, nq)
            win_bid = jnp.max(bid_mat, axis=1)         # (B, nq)
            win_col = jnp.argmax(bid_mat, axis=1)      # (B, nq)
            got = win_bid > -jnp.inf
            price = jnp.where(got, price + win_bid, price)
            owner = jnp.where(got, win_col, owner)
            return price, owner

        price, owner = jax.lax.fori_loop(0, iters, body, (price, owner))
        return (price, owner), None

    price0 = jnp.zeros((B, nq), jnp.float32)
    owner0 = jnp.full((B, nq), -1, jnp.int32)
    eps_schedule = jnp.asarray([0.1, 0.01, 1e-3]) * scale
    (price, owner), _ = jax.lax.scan(run_phase, (price0, owner0), eps_schedule)

    # invert owner -> assign per column
    col_match = owner[:, None, :] == jnp.arange(G)[None, :, None]  # (B, G, nq)
    assign_q = jnp.argmax(col_match, axis=2).astype(jnp.int32)
    return assign_q


def scipy_assign(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """Exact reference assignment via host scipy (matcher.py:97)."""
    def host(cost_np, valid_np):
        from scipy.optimize import linear_sum_assignment

        B, nq, G = cost_np.shape
        out = np.zeros((B, G), np.int32)
        for b in range(B):
            g = int(valid_np[b].sum())
            if g == 0:
                continue
            r, c = linear_sum_assignment(cost_np[b, :, :g])
            # rows r matched to cols c; invert to per-col query
            out[b, c] = r.astype(np.int32)
        return out

    B, _, G = cost.shape
    return jax.pure_callback(
        host, jax.ShapeDtypeStruct((B, G), jnp.int32), cost, valid,
        vmap_method="sequential",
    )


def hungarian_match(
    pred_logits, pred_keypoints, targets, num_body_points,
    cost_class=2.0, cost_keypoints=10.0, cost_oks=4.0, focal_alpha=0.25,
    backend="auction",
):
    """Full matcher: cost + assignment. Returns assign_q (B, G) int32."""
    c = match_cost(pred_logits, pred_keypoints, targets, num_body_points,
                   cost_class, cost_keypoints, cost_oks, focal_alpha)
    c = jax.lax.stop_gradient(c)
    if backend == "scipy":
        return scipy_assign(c, targets["valid"])
    return auction_assign(c, targets["valid"])

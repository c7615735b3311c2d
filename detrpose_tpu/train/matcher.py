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
    # The literal `1 - p + 1e-8` is UNSAFE under jit: XLA's algebraic
    # simplifier reassociates it to `(1 + 1e-8) - p`, which constant-folds to
    # `1.0 - p` in f32 and sends the log to -inf at saturated logits (x>17).
    # The maximum() blocks the reassociation and matches torch's value
    # (p <= 1 so the max is an exact no-op; reference matcher.py:60-63).
    one_m_p = jnp.maximum(1.0 - p, 0.0)
    neg = (1 - focal_alpha) * p**gamma * (-jnp.log(one_m_p + 1e-8))
    pos = focal_alpha * one_m_p**gamma * (-jnp.log(jnp.maximum(p, 0.0) + 1e-8))
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


def auction_assign(cost: jax.Array, valid: jax.Array, iters: int = 128) -> jax.Array:
    """Min-cost assignment via Bertsekas auction with epsilon scaling (pure jnp).

    Columns (GT instances, <= 32) bid for rows (queries). Each unassigned
    column bids best-minus-second-best + eps on its best query; the highest
    bidder takes the query, evicting the previous owner. With eps scaling the
    final matching is within G*eps_final of optimal — in practice identical to
    scipy LSAP (tested in tests/test_train_stack.py).

    Args:
      cost: (B, nq, G); valid: (B, G).
    Returns:
      assign_q: (B, G) int32, query index per GT (distinct within a batch elem).
    """
    B, nq, G = cost.shape
    value = -cost.astype(jnp.float32).transpose(0, 2, 1)  # (B, G, nq)
    value = jnp.where(valid[:, :, None], value, -BIG)
    scale = jnp.maximum(
        jnp.max(jnp.abs(jnp.where(jnp.abs(value) < BIG / 2, value, 0.0))), 1.0)

    bidx = jnp.arange(B)[:, None]
    gidx = jnp.arange(G)[None, :]

    def run_phase(carry, eps):
        # Single-phase-per-eps from ZERO prices. For this rectangular problem
        # (persons = GT columns << objects = queries) the eps-CS optimality
        # bound needs unassigned objects to keep minimal price, so prices must
        # NOT carry over between eps phases; with few persons each phase
        # converges in well under `iters` rounds anyway, and the last (finest
        # eps) phase determines the returned assignment.
        del carry
        price = jnp.zeros((B, nq), jnp.float32)
        owner = jnp.full((B, nq), -1, jnp.int32)
        assigned = jnp.full((B, G), -1, jnp.int32)

        def body(i, c):
            price, owner, assigned = c
            net = value - price[:, None, :]            # (B, G, nq)
            best = jnp.argmax(net, axis=2)             # (B, G)
            best_v = jnp.max(net, axis=2)
            second_v = jnp.max(
                jnp.where(jax.nn.one_hot(best, nq, dtype=bool), -jnp.inf, net),
                axis=2)
            bid = best_v - second_v + eps
            active = valid & (assigned < 0)
            bid_mat = jnp.where(
                active[:, :, None] & jax.nn.one_hot(best, nq, dtype=bool),
                bid[:, :, None], -jnp.inf)             # (B, G, nq)
            win_bid = jnp.max(bid_mat, axis=1)         # (B, nq)
            win_col = jnp.argmax(bid_mat, axis=1).astype(jnp.int32)
            got = win_bid > -jnp.inf
            new_owner = jnp.where(got, win_col, owner)
            price = jnp.where(got, price + win_bid, price)
            # previously assigned columns keep their query iff still the owner
            q_safe = jnp.maximum(assigned, 0)
            still = (assigned >= 0) & (new_owner[bidx, q_safe] == gidx)
            # winners: column g won iff it was active and now owns its best
            won = active & (new_owner[bidx, best] == gidx) & got[bidx, best]
            assigned = jnp.where(won, best.astype(jnp.int32),
                                 jnp.where(still, assigned, -1))
            return price, new_owner, assigned

        price, owner, assigned = jax.lax.fori_loop(
            0, iters, body, (price, owner, assigned))
        return (price, owner, assigned), None

    (price, owner, assigned), _ = run_phase(None, 1e-3 * scale)
    return jnp.maximum(assigned, 0)


def scipy_assign(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """Exact reference assignment via host scipy (matcher.py:97).

    The host fn is leading-dims-agnostic and the callback batches with
    ``expand_dims``, so the criterion's vmap over ~9 supervision branches
    costs ONE host round-trip per step, not nine (sequential callbacks also
    fragment the XLA CPU program into serialized segments). broadcast_all
    (not expand_dims): `valid` is closed over by the vmapped criterion, so it
    must be broadcast to the mapped batch for the flat host loop to align."""
    # Import at definition time, NOT inside the callback: an import from the
    # callback thread takes Python's module import locks while the main
    # thread may be blocked in the runtime — one more deadlock edge on a
    # single-threaded CPU executor.
    from scipy.optimize import linear_sum_assignment

    def host(cost_np, valid_np):
        # The callback may receive jax.Arrays, and ANY jax op issued from the
        # callback thread (even a reshape) re-enters the dispatcher while the
        # XLA CPU executor is blocked inside this very callback — a real
        # deadlock observed as all-threads-futex_wait mid-epoch. Copy to
        # numpy FIRST; everything below must stay pure numpy/scipy.
        cost_np = np.asarray(cost_np)
        valid_np = np.asarray(valid_np)
        lead = cost_np.shape[:-2]
        nq, G = cost_np.shape[-2:]
        c2 = cost_np.reshape(-1, nq, G)
        v2 = valid_np.reshape(-1, G)
        out = np.zeros((c2.shape[0], G), np.int32)
        for b in range(c2.shape[0]):
            g = int(v2[b].sum())
            if g == 0:
                continue
            r, c = linear_sum_assignment(c2[b, :, :g])
            # rows r matched to cols c; invert to per-col query
            out[b, c] = r.astype(np.int32)
        return out.reshape(lead + (G,))

    # broadcast_all batches the criterion's ~9 vmapped branches into ONE host
    # round-trip (fast path). With a SECOND threaded runtime co-resident in
    # the process (torch training loops, as in parity-race harnesses), the
    # batched callback intermittently wedges the single-threaded XLA CPU
    # executor at full model dims (all threads futex_wait; toy dims run
    # clean); `sequential` has never wedged and costs ~equal at small batch.
    # Auto-select: honor DETRPOSE_SCIPY_VMAP when set; otherwise pick
    # `sequential` whenever torch is co-resident in the process (the only
    # condition under which broadcast_all has ever wedged) and the batched
    # fast path when jax owns the process. Documented in README "Matching
    # backends".
    import os
    import sys as _sys

    vmap_method = os.environ.get("DETRPOSE_SCIPY_VMAP")
    if vmap_method is None:
        vmap_method = "sequential" if "torch" in _sys.modules else "broadcast_all"

    B, _, G = cost.shape
    return jax.pure_callback(
        host, jax.ShapeDtypeStruct((B, G), jnp.int32), cost, valid,
        vmap_method=vmap_method,
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

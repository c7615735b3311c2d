"""Multi-scale deformable attention core — functional, NHWC, TPU-first.

Semantics follow the reference pure-PyTorch core
(reference: src/models/detrpose/ms_deform_attn.py:145-193): for each query,
head, pyramid level, and sampling point, bilinearly sample the per-head value
map at ``2*loc-1`` with grid_sample(align_corners=False, zeros padding), then
reduce with softmaxed attention weights over (levels x points).

Design differences from the reference (TPU-first, not a translation):
  * values are carried as a list of NHWC per-level maps with *static* shapes —
    each (level set, resolution) traces to one XLA program; no dynamic shapes.
  * the per-level gather indexes a flat (H*W) axis with channel-minor layout so
    XLA emits one dynamic-gather per level with a lane-aligned minor dim.
  * an optional fused Pallas kernel (ops/pallas) keeps the flattened pyramid in
    VMEM and performs gather + weighting in one pass.
"""
from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp


def _level_sample_onehot(v, loc, aw):
    """One level of deformable sampling as a dense one-hot matmul.

    Bit-equivalent semantics to the gather path (grid_sample
    align_corners=False, zeros padding): builds the (Lq*nP, H*W) bilinear
    weight matrix (4 corner one-hots x their weights x validity) and contracts
    it with the value map in a single dot.

    v: (B, H, W, nH, dh); loc: (B, Lq, nH, nP, 2); aw: (B, Lq, nH, nP).
    Returns (B, nH, Lq, dh) in f32.
    """
    B, H, W, nH, dh = v.shape
    _, Lq, _, nP, _ = loc.shape
    ix = loc[..., 0] * W - 0.5          # (B, Lq, nH, nP)
    iy = loc[..., 1] * H - 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    hw = jnp.arange(H * W, dtype=jnp.int32)
    weights = jnp.zeros((B, Lq, nH, nP, H * W), jnp.float32)
    for dx, dy in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xc = x0 + dx
        yc = y0 + dy
        wgt = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
        valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        idx = yi * W + xi                                  # (B, Lq, nH, nP)
        onehot = (idx[..., None] == hw).astype(jnp.float32)
        weights = weights + onehot * (
            wgt * valid.astype(wgt.dtype))[..., None].astype(jnp.float32)

    # fold the attention weight, then one contraction over (nP, H*W)
    weights = weights * aw[..., None].astype(jnp.float32)
    vflat = v.reshape(B, H * W, nH, dh).astype(jnp.float32)
    # (B, Lq, nH, nP, S) x (B, S, nH, dh) -> (B, nH, Lq, dh)
    return jnp.einsum("bqhps,bshd->bhqd", weights, vflat,
                      preferred_element_type=jnp.float32)


def ms_deform_attn(
    value_levels: Sequence[jax.Array],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Compute multi-scale deformable attention.

    Args:
      value_levels: list of per-level value maps, each (B, H_l, W_l, n_heads, d_head).
      sampling_locations: (B, Lq, n_heads, n_levels, n_points, 2), normalized [0, 1] (x, y).
      attention_weights: (B, Lq, n_heads, n_levels, n_points), softmaxed over (levels*points).

    Returns:
      (B, Lq, n_heads * d_head)
    """
    B, Lq, nH, nL, nP, _ = sampling_locations.shape
    assert len(value_levels) == nL
    d_head = value_levels[0].shape[-1]
    dtype = value_levels[0].dtype

    # Small levels take the one-hot MXU path: exact same bilinear result as
    # the gather, but expressed as one (Lq*nP, H*W) x (H*W, d_head) matmul per
    # (batch, head, level). On TPU the matmul rides the MXU; on XLA:CPU it
    # avoids the pathologically slow elemental gather emitter (measured 100x
    # on the 8-virtual-device dryrun). Gather stays the default for big
    # levels, where one-hot FLOPs would dwarf the gather traffic.
    onehot_max_hw = int(os.environ.get("MSDA_ONEHOT_MAX_HW", "256"))

    out = jnp.zeros((B, nH, Lq, d_head), dtype=jnp.promote_types(dtype, jnp.float32))
    for lvl in range(nL):
        v = value_levels[lvl]
        H, W = v.shape[1], v.shape[2]
        if H * W <= onehot_max_hw:
            out = out + _level_sample_onehot(
                v, sampling_locations[:, :, :, lvl],
                attention_weights[:, :, :, lvl])
            continue
        # (B, Lq, nH, nP, 2) for this level -> per-(batch, head) flat sample lists.
        loc = sampling_locations[:, :, :, lvl]  # (B, Lq, nH, nP, 2)
        # torch: grid = 2*loc - 1; ix = ((grid+1)*W - 1)/2 = loc*W - 0.5
        ix = loc[..., 0] * W - 0.5  # (B, Lq, nH, nP)
        iy = loc[..., 1] * H - 0.5

        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        x1 = x0 + 1.0
        y1 = y0 + 1.0
        w00 = (x1 - ix) * (y1 - iy)
        w01 = (x1 - ix) * (iy - y0)
        w10 = (ix - x0) * (y1 - iy)
        w11 = (ix - x0) * (iy - y0)

        def corner_weight(xc, yc, w):
            # grid_sample zeros padding: out-of-range corners contribute 0.
            valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
            return w * valid.astype(w.dtype)

        sampler = os.environ.get("MSDA_LEVEL_SAMPLER", "corner")
        if sampler == "allheads":
            # Wide-row gather: one row per (query, point) carrying ALL heads'
            # channels (nH*dh = 256 lanes = 512 B at bf16), gathered once per
            # corner per head-index set. TPU gathers are row-count bound at
            # small widths (the 64 B corner rows of the default path measured
            # ~42 ms/level-0-call); pulling 8x the bytes per row and slicing
            # the head's 32 lanes afterwards trades sequential-stream bytes
            # (cheap at HBM bandwidth) for 8x fewer gather descriptors.
            vflat = v.reshape(B, H * W, nH * d_head)

            def tap_ah(xc, yc, w):
                xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
                yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
                idx = (yi * W + xi).transpose(0, 2, 1, 3).reshape(
                    B, nH, Lq * nP)                       # (B, nH, Lq*nP)
                wv = corner_weight(xc, yc, w).transpose(0, 2, 1, 3).reshape(
                    B, nH, Lq * nP)
                parts = []
                for h in range(nH):
                    g = jnp.take_along_axis(
                        vflat, idx[:, h, :, None], axis=1)   # (B, Lq*nP, 256)
                    parts.append(g[..., h * d_head:(h + 1) * d_head])
                g = jnp.stack(parts, axis=1)              # (B, nH, Lq*nP, dh)
                return g * wv[..., None]

            sampled = (tap_ah(x0, y0, w00) + tap_ah(x0, y1, w01) +
                       tap_ah(x1, y0, w10) + tap_ah(x1, y1, w11))
        elif sampler == "corner":
            # Default path: 4 separate row gathers of d_head(=32)-wide rows.
            # The patch path below replaces them with ONE 128-wide-row gather
            # (microbenchmarked ~4x faster per gathered row on the sandbox
            # TPU) at the cost of materializing a 4x patch table per level;
            # which wins depends on Lq*nP vs H*W — A/B via MSDA_LEVEL_SAMPLER
            # before changing the default.
            vflat = v.reshape(B, H * W, nH, d_head).transpose(0, 2, 1, 3)

            def tap(xc, yc, w):
                xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
                yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
                idx = (yi * W + xi).transpose(0, 2, 1, 3).reshape(B, nH, Lq * nP)
                g = jnp.take_along_axis(vflat, idx[..., None], axis=2)
                wv = corner_weight(xc, yc, w).transpose(0, 2, 1, 3).reshape(
                    B, nH, Lq * nP)
                return g * wv[..., None]

            sampled = (tap(x0, y0, w00) + tap(x0, y1, w01) +
                       tap(x1, y0, w10) + tap(x1, y1, w11))
        else:
            # Patch path (opt-in): prebuild P[y, x] = the 2x2 corner patch
            # [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] concatenated on the channel
            # axis, so ALL FOUR bilinear corners arrive in ONE row gather whose
            # rows are 4*d_head = 128 wide (a full lane tile). Building P is
            # pure elementwise/copy traffic (bandwidth-cheap); the win is that
            # sub-lane (32-wide) row gathers run ~4x slower on TPU. Zero
            # padding reproduces grid_sample's zeros-padding; corner validity
            # is still folded into the weights (handles samples further than
            # one pixel outside, where the clipped patch would alias).
            # Transpose v FIRST (1x the bytes), then pad + slice + concat in
            # the final layout — transposing the built 4x-size table would
            # move 4x the bytes for the same result.
            vt = v.transpose(0, 3, 1, 2, 4)  # (B, nH, H, W, dh)
            vp = jnp.pad(vt, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
            P = jnp.concatenate(
                [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
                 vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
            Pflat = P.reshape(B, nH, (H + 1) * (W + 1), 4 * d_head)
            px = (jnp.clip(x0, -1, W - 1) + 1).astype(jnp.int32)
            py = (jnp.clip(y0, -1, H - 1) + 1).astype(jnp.int32)
            idx = (py * (W + 1) + px).transpose(0, 2, 1, 3).reshape(
                B, nH, Lq * nP)
            g = jnp.take_along_axis(Pflat, idx[..., None], axis=2)
            # same corner order as P's channel blocks: (y,x),(y,x+1),(y+1,x),(y+1,x+1)
            ws = jnp.stack(
                [corner_weight(x0, y0, w00), corner_weight(x1, y0, w10),
                 corner_weight(x0, y1, w01), corner_weight(x1, y1, w11)],
                axis=-1)  # (B, Lq, nH, nP, 4)
            wsT = ws.transpose(0, 2, 1, 3, 4).reshape(B, nH, Lq * nP, 4)
            sampled = jnp.sum(
                g.reshape(B, nH, Lq * nP, 4, d_head) * wsT[..., None], axis=3)
        # Name the bilinear result in a LANE-FULL layout (minor dim nP*dh =
        # 128) so the training-time checkpoint policy can save exactly this
        # tensor: the d_head=32-minor corner temporaries would tile-pad 4x on
        # TPU, and without any save the backward re-runs the gathers. See
        # models/decoder.py (checkpoint policy around this function).
        from jax.ad_checkpoint import checkpoint_name

        sampled = checkpoint_name(
            sampled.reshape(B, nH, Lq, nP * d_head), "msda_sampled")
        # (B, nH, Lq, nP, d_head) weighted by attention.
        sampled = sampled.reshape(B, nH, Lq, nP, d_head)
        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B, nH, Lq, nP)
        out = out + jnp.sum(sampled * aw[..., None], axis=3)

    # (B, nH, Lq, d_head) -> (B, Lq, nH*d_head)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, nH * d_head).astype(dtype)

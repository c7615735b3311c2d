"""Fused multi-scale deformable-attention gather as a Pallas TPU kernel.

Semantics identical to ops/ms_deform_attn.ms_deform_attn (reference:
src/models/detrpose/ms_deform_attn.py:145-193 — grid_sample
align_corners=False, zeros padding, weighted sum over levels x points), with
the whole flattened feature pyramid held in VMEM per (batch, head) grid step
and the gather + bilinear blend + attention weighting fused in one pass — no
(B, nH, Lq*nP, d_head) corner temporaries ever touch HBM.

Trade-off, measured not assumed (tools/pallas_bench.py): the per-sample row
fetches are scalar dynamic slices (Mosaic has no vectorized row-gather), so
this kernel trades VPU width for HBM traffic. `ms_deform_attn` in
ops/ms_deform_attn.py stays the default; this kernel is opt-in via
ModelConfig(msda_backend="pallas") and is selected only where the measurement
favors it.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (needed for interpret-mode tests)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_TQ = 128  # queries per grid step


def _msda_kernel(loc_ref, aw_ref, v_ref, o_ref, *, level_shapes, nP, dh, n_q):
    """One (batch, head, query-tile) step.

    loc_ref: (1, 1, TQ, nL*nP*2) SMEM — sampling locations, normalized [0,1]
    aw_ref:  (1, 1, TQ, nL*nP)   SMEM — attention weights (softmaxed)
    v_ref:   (1, 1, S, dh)       VMEM — this (b, h)'s flattened pyramid
    o_ref:   (1, 1, TQ, dh)      VMEM

    Mosaic requires dynamic sublane indices to be provably 8-aligned, so the
    gather loads an aligned 8-row block and selects the row in-register, and
    results are stored in aligned 8-query blocks.
    """
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def q_one(qi):
        acc = jnp.zeros((1, dh), jnp.float32)
        off = 0
        for lvl, (H, W) in enumerate(level_shapes):
            for p in range(nP):
                base = (lvl * nP + p) * 2
                x = loc_ref[0, 0, qi, base] * W - 0.5
                y = loc_ref[0, 0, qi, base + 1] * H - 0.5
                a = aw_ref[0, 0, qi, lvl * nP + p]
                x0 = jnp.floor(x)
                y0 = jnp.floor(y)
                fx = x - x0
                fy = y - y0
                for dx, dy in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    xc = x0 + dx
                    yc = y0 + dy
                    wgt = ((fx if dx else 1.0 - fx)
                           * (fy if dy else 1.0 - fy))
                    valid = ((xc >= 0) & (xc <= W - 1)
                             & (yc >= 0) & (yc <= H - 1))
                    xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
                    yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
                    idx = off + yi * W + xi
                    idx_al = pl.multiple_of((idx // 8) * 8, 8)
                    block = v_ref[0, 0, pl.ds(idx_al, 8), :]     # (8, dh)
                    sel = (sub_iota == idx - idx_al).astype(jnp.float32)
                    row = jnp.sum(block.astype(jnp.float32) * sel,
                                  axis=0, keepdims=True)         # (1, dh)
                    acc = acc + row * (a * wgt
                                       * valid.astype(jnp.float32))
            off += H * W
        return acc

    def q_block(qb, _):
        rows = [q_one(qb * 8 + j) for j in range(8)]
        block = jnp.concatenate(rows, axis=0)                    # (8, dh)
        start = pl.multiple_of(qb * 8, 8)
        o_ref[0, 0, pl.ds(start, 8), :] = block.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_q // 8, q_block, 0)


def ms_deform_attn_pallas(
    value_levels: Sequence[jax.Array],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.ms_deform_attn.ms_deform_attn.

    Args:
      value_levels: per level (B, H_l, W_l, nH, dh)
      sampling_locations: (B, Lq, nH, nL, nP, 2), normalized (x, y)
      attention_weights: (B, Lq, nH, nL, nP)
    Returns:
      (B, Lq, nH * dh)
    """
    B, Lq, nH, nL, nP, _ = sampling_locations.shape
    dh = value_levels[0].shape[-1]
    level_shapes = tuple((int(v.shape[1]), int(v.shape[2]))
                         for v in value_levels)
    dtype = value_levels[0].dtype

    # (B, nH, S, dh) flattened pyramid; S padded to a multiple of 8 so the
    # kernel's aligned 8-row block loads never overrun
    vflat = jnp.concatenate(
        [v.reshape(B, -1, nH, dh).transpose(0, 2, 1, 3)
         for v in value_levels], axis=2)
    s_pad = (-vflat.shape[2]) % 8
    if s_pad:
        vflat = jnp.pad(vflat, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
    S = vflat.shape[2]

    # pad queries to the tile size
    Lq_pad = -(-Lq // _TQ) * _TQ
    loc = jnp.pad(sampling_locations,
                  ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0), (0, 0), (0, 0)))
    aw = jnp.pad(attention_weights,
                 ((0, 0), (0, Lq_pad - Lq), (0, 0), (0, 0), (0, 0)))
    # (B, nH, Lq_pad, nL*nP*2) / (B, nH, Lq_pad, nL*nP) scalar-access layout
    loc = loc.transpose(0, 2, 1, 3, 4, 5).reshape(B, nH, Lq_pad, nL * nP * 2)
    aw = aw.transpose(0, 2, 1, 3, 4).reshape(B, nH, Lq_pad, nL * nP)

    kernel = functools.partial(
        _msda_kernel, level_shapes=level_shapes, nP=nP, dh=dh, n_q=_TQ)

    smem = pltpu.SMEM if pltpu is not None else None
    vmem = pltpu.VMEM if pltpu is not None else None
    out = pl.pallas_call(
        kernel,
        grid=(B, nH, Lq_pad // _TQ),
        in_specs=[
            pl.BlockSpec((1, 1, _TQ, nL * nP * 2),
                         lambda b, h, q: (b, h, q, 0), memory_space=smem),
            pl.BlockSpec((1, 1, _TQ, nL * nP),
                         lambda b, h, q: (b, h, q, 0), memory_space=smem),
            pl.BlockSpec((1, 1, S, dh),
                         lambda b, h, q: (b, h, 0, 0), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, 1, _TQ, dh),
                               lambda b, h, q: (b, h, q, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((B, nH, Lq_pad, dh), dtype),
        interpret=interpret,
    )(loc, aw, vflat)

    return (out[:, :, :Lq]                       # (B, nH, Lq, dh)
            .transpose(0, 2, 1, 3).reshape(B, Lq, nH * dh))

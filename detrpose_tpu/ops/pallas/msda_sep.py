"""Separable-one-hot multi-scale deformable attention — Pallas TPU kernel.

Semantics: identical to ops/ms_deform_attn.ms_deform_attn (reference
src/models/detrpose/ms_deform_attn.py:145-193 — grid_sample
align_corners=False, zeros padding, attention-weighted sum over
levels x points), evaluated in bf16 like the rest of the model.

Why this kernel exists (round-5 measurement): the XLA gather path costs
168.7 ms/call at DETRPose-L eval shapes — descriptor-rate bound (~14 ms per
1.1M-row gather regardless of row width; tools_local_msda_variants.py), and
the op's bandwidth roofline is ~2-4 ms. The previous Pallas kernel
(ops/pallas/msda.py) was one-query-at-a-time scalar work: 251 ms. This
kernel has NO scalar loops and NO gathers:

  bilinear sampling is separable:  sample(p) = r_y(p)^T  V  c_x(p)
  where r_y has 2 nonzeros (rows y0, y0+1 weighted 1-fy, fy) and c_x has 2
  nonzeros (cols x0, x0+1 weighted 1-fx, fx); grid_sample's zeros padding
  is exactly per-axis validity folded into those weights. So per point tile:

    R    (TP, H)      hat-function arithmetic on a row iota     (VPU, cheap)
    T  = R @ V        V as (H, W*dh)                            (MXU)
    M  = T * Cexp     Cexp[p, x*dh+d] = c_x(p)[x], hat weights  (VPU)
    out = tree-fold of M's W lane-groups down to dh lanes       (VPU)

  and the attention weight rides in R. Everything is (sublane, lane)-shaped
  vector work; the one-hot matrices never touch HBM.

Measured at L eval shapes (B32, nH8, Lq1080, nP4, levels 80/40/20) on TPU
v5e: 18.2 ms/call vs 168.7 ms for the XLA gather — with the cost split
pinned by tools_local_msda_ablate.py (grid/IO floor 2.8 ms, +R/stage-1
matmul -> 4.3 ms, the rest is the stage-2 hat/multiply/fold VPU arithmetic,
which is op-bound, not bandwidth-bound). Rejected variants, all measured:
constant-selector output matmul (+10.8 ms: dh=32 of 128 MXU output lanes),
constant lane-expander input matmul (+3 ms net), grouped jnp.sum (Mosaic
cannot shape-cast lanes), pltpu.repeat (tile-concat, not interleave).

Training: the op is exposed through a custom_vjp whose backward re-derives
gradients through the XLA gather path (bit-identical semantics), so the
kernel only has to be a fast forward; the checkpoint policy in
models/decoder.py is unchanged.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # importable on CPU for interpret-mode tests
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_TP = 512          # sample points per grid step (= _TP // nP queries)


def _kernel(ix_refs, iy_refs, aw_refs, v_refs, o_ref, *,
            level_shapes, dh, out_dtype):
    """One (batch, head, point-tile) grid step.

    ix/iy/aw_refs: per level (1, 1, 1, TP) f32 — pixel-space sample coords
      (already loc * size - 0.5) and combined attention weight.
    v_refs: per level (1, 1, H, W*dh) value map (bf16).
    o_ref: (1, 1, TP, dh) f32 — per-POINT samples (weighted); the caller
      folds the nP points of each query and casts.
    """
    acc = None
    for lvl, (H, W) in enumerate(level_shapes):
        ix = ix_refs[lvl][0, 0].reshape(_TP, 1)     # (TP, 1) f32
        iy = iy_refs[lvl][0, 0].reshape(_TP, 1)
        a = aw_refs[lvl][0, 0].reshape(_TP, 1)

        # Bilinear weights as the hat function relu(1 - |coord - index|):
        # for y0 <= iy < y0+1 this yields exactly (1-fy, fy) on rows
        # (y0, y0+1) and zero elsewhere, and grid_sample's zeros padding
        # falls out for free — an out-of-range sample is simply within
        # distance < 1 of no in-range index. Pure arithmetic; no int
        # compares, clips, or selects (which Mosaic also lowers poorly
        # for 16-bit vectors).
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (_TP, H), 1).astype(jnp.float32)
        R = ((jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0)) * a
             ).astype(jnp.bfloat16)                 # attention weight rides R

        # T (TP, W*dh) = R @ V   (MXU, contraction over H)
        T = jnp.dot(R, v_refs[lvl][0, 0],
                    preferred_element_type=jnp.float32)

        # Cexp (TP, W*dh): hat weight of column x broadcast over its dh
        # lanes. Measured alternatives all LOSE: a constant-selector output
        # matmul 10.8 ms (dh=32 of 128 MXU output lanes), a constant
        # lane-expander input matmul +3 ms net, pltpu.repeat has tile-concat
        # (not interleave) semantics, and Mosaic cannot shape-cast lanes for
        # a grouped jnp.sum. Direct VPU arithmetic at (TP, W*dh) it is.
        cols = (jax.lax.broadcasted_iota(jnp.int32, (_TP, W * dh), 1)
                // dh).astype(jnp.float32)
        Cexp = jnp.maximum(1.0 - jnp.abs(ix - cols), 0.0)

        # out (TP, dh) = sum over x of (T * Cexp) lane-groups. A constant
        # selector MATMUL here costs 10.8 ms/call (output only dh=32 of 128
        # MXU lanes, K=W*dh huge) and Mosaic cannot shape-cast lanes for a
        # grouped jnp.sum — so tree-fold with static lane slices: halve while
        # even (offsets stay 128-aligned until the tail), then sum the tail
        # groups. ~2 passes of VPU adds total (tools_local_msda_ablate.py).
        M = T * Cexp
        w = W
        while w % 2 == 0 and w > 1:
            half = (w // 2) * dh
            M = M[:, :half] + M[:, half:2 * half]
            w //= 2
        part = M[:, :dh]
        for i in range(1, w):
            part = part + M[:, i * dh:(i + 1) * dh]
        acc = part if acc is None else acc + part

    o_ref[0, 0] = acc.astype(out_dtype)


def ms_deform_attn_sep(
    value_levels: Sequence[jax.Array],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.ms_deform_attn.ms_deform_attn.

    Args:
      value_levels: per level (B, H_l, W_l, nH, dh)
      sampling_locations: (B, Lq, nH, nL, nP, 2), normalized (x, y)
      attention_weights: (B, Lq, nH, nL, nP), softmaxed over levels*points
    Returns:
      (B, Lq, nH * dh)
    """
    B, Lq, nH, nL, nP, _ = sampling_locations.shape
    dh = value_levels[0].shape[-1]
    dtype = value_levels[0].dtype
    level_shapes = tuple((int(v.shape[1]), int(v.shape[2]))
                         for v in value_levels)

    P = Lq * nP
    n_t = -(-P // _TP)
    P_pad = n_t * _TP

    # ---- per-level point arrays, (B, nH, n_t, TP), q-major p-minor
    ixs, iys, aws, vls = [], [], [], []
    for lvl, (H, W) in enumerate(level_shapes):
        loc = sampling_locations[:, :, :, lvl]       # (B, Lq, nH, nP, 2)
        ix = loc[..., 0] * W - 0.5                   # torch grid_sample map
        iy = loc[..., 1] * H - 0.5
        a = attention_weights[:, :, :, lvl]          # (B, Lq, nH, nP)

        def pack(t):
            # (B, nH*n_t, 1, TP): Mosaic requires the last two block dims to
            # be (full-size, 128-multiple); a singleton axis satisfies that.
            t = t.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, nH, P)
            t = jnp.pad(t, ((0, 0), (0, 0), (0, P_pad - P)))
            return t.reshape(B, nH * n_t, 1, _TP)

        ixs.append(pack(ix))
        iys.append(pack(iy))
        aws.append(pack(a))                          # padded aw == 0
        vls.append(value_levels[lvl]
                   .transpose(0, 3, 1, 2, 4)         # (B, nH, H, W, dh)
                   .reshape(B, nH, H, W * dh).astype(jnp.bfloat16))

    pt_spec = pl.BlockSpec(
        (1, 1, 1, _TP), lambda b, h, t, n_t=n_t: (b, h * n_t + t, 0, 0),
        memory_space=pltpu.VMEM if pltpu is not None else None)
    v_specs = [
        pl.BlockSpec((1, 1, H, W * dh), lambda b, h, t: (b, h, 0, 0),
                     memory_space=pltpu.VMEM if pltpu is not None else None)
        for H, W in level_shapes
    ]

    kernel = functools.partial(
        _kernel, level_shapes=level_shapes, dh=dh, out_dtype=jnp.float32)

    def wrapped(*refs):
        # refs: nL ix, nL iy, nL aw, nL v, out
        k = nL
        kernel(refs[0:k], refs[k:2 * k], refs[2 * k:3 * k],
               refs[3 * k:4 * k], refs[4 * k])

    out = pl.pallas_call(
        wrapped,
        grid=(B, nH, n_t),
        in_specs=[pt_spec] * (3 * nL) + v_specs,
        out_specs=pl.BlockSpec(
            (1, 1, _TP, dh), lambda b, h, t: (b, h, t, 0),
            memory_space=pltpu.VMEM if pltpu is not None else None),
        out_shape=jax.ShapeDtypeStruct((B, nH, n_t * _TP, dh), jnp.float32),
        interpret=interpret,
    )(*ixs, *iys, *aws, *vls)

    # fold the nP points of each query, drop padding, restore layout
    out = out[:, :, :P].reshape(B, nH, Lq, nP, dh).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, nH * dh).astype(dtype)


@jax.custom_vjp
def ms_deform_attn_fast(value_levels, sampling_locations, attention_weights):
    """MSDA with the separable Pallas kernel forward and the XLA gather
    path's gradients (the two are the same math; the kernel quantizes
    bilinear weights to bf16, which is inside the model's bf16 noise floor —
    max rel err ~5e-3 vs the f32-weight gather, tests/test_msda_sep.py).

    Measured on TPU v5e at DETRPose-L eval shapes: 19.3 ms/call vs 168.7 ms
    for the XLA gather (tools_local_msda_variants.py) — the forward is where
    eval/serving lives; training gradients keep the checkpoint-policy-tuned
    XLA path.
    """
    return ms_deform_attn_sep(value_levels, sampling_locations,
                              attention_weights)


def _fast_fwd(value_levels, loc, aw):
    return ms_deform_attn_fast(value_levels, loc, aw), (value_levels, loc, aw)


def _fast_bwd(res, g):
    from ..ms_deform_attn import ms_deform_attn as _xla_msda
    value_levels, loc, aw = res
    _, vjp = jax.vjp(_xla_msda, list(value_levels), loc, aw)
    return tuple(vjp(g))


ms_deform_attn_fast.defvjp(_fast_fwd, _fast_bwd)

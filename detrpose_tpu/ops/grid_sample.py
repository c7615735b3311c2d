"""Bilinear grid sampling with PyTorch ``F.grid_sample`` semantics on NHWC maps.

Semantics matched exactly (golden-tested against torch in
tests/test_grid_sample.py): ``mode='bilinear'``, ``padding_mode='zeros'``,
``align_corners=False`` — the configuration used by the reference deformable
attention core (reference: src/models/detrpose/ms_deform_attn.py:178) and the
LQE head (reference: src/models/detrpose/transformer.py:278-280).

Key detail: with zero padding each of the four corner taps is zeroed
*individually* when it falls outside the map — the sample as a whole is NOT
masked. An off-by-half-pixel or whole-sample masking here visibly moves
keypoints and breaks AP parity.

TPU notes: the gather is expressed as a flat one-dimensional ``jnp.take`` over
the flattened H*W axis so XLA lowers it to a single dynamic-gather HLO with a
static channel minor dimension (lane-friendly). The hot path (deformable
attention) has a fused Pallas variant in ``ops/pallas``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def bilinear_grid_sample(feat: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample ``feat`` at normalized locations ``grid``.

    Args:
      feat: (B, H, W, C) feature map (NHWC).
      grid: (B, ..., 2) sampling locations in [-1, 1], last dim = (x, y).

    Returns:
      (B, ..., C) sampled values, zero outside the map.
    """
    B, H, W, C = feat.shape
    out_shape = grid.shape[:-1] + (C,)
    gx = grid[..., 0].reshape(B, -1)
    gy = grid[..., 1].reshape(B, -1)

    # align_corners=False un-normalization.
    ix = ((gx + 1.0) * W - 1.0) * 0.5
    iy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # Corner weights (bilinear).
    w00 = (x1 - ix) * (y1 - iy)  # (x0, y0)
    w01 = (x1 - ix) * (iy - y0)  # (x0, y1)
    w10 = (ix - x0) * (y1 - iy)  # (x1, y0)
    w11 = (ix - x0) * (iy - y0)  # (x1, y1)

    flat = feat.reshape(B, H * W, C)

    # Small maps: dense one-hot contraction instead of 4 gathers — exact same
    # bilinear result, MXU-friendly on TPU and immune to XLA:CPU's slow
    # elemental gather emitter (see ops/ms_deform_attn.py).
    if H * W <= int(os.environ.get("MSDA_ONEHOT_MAX_HW", "256")):
        hw = jnp.arange(H * W, dtype=jnp.int32)
        weights = jnp.zeros(ix.shape + (H * W,), jnp.float32)
        for xc, yc, w in ((x0, y0, w00), (x0, y1, w01),
                          (x1, y0, w10), (x1, y1, w11)):
            valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
            xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
            yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
            idx = yi * W + xi
            onehot = (idx[..., None] == hw).astype(jnp.float32)
            weights = weights + onehot * (
                w * valid.astype(w.dtype))[..., None].astype(jnp.float32)
        out = jnp.einsum("bqs,bsc->bqc", weights, flat.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(feat.dtype)
        return out.reshape(out_shape)

    def tap(xc, yc, w):
        valid = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        idx = yi * W + xi
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return v * (w * valid.astype(feat.dtype))[..., None]

    out = tap(x0, y0, w00) + tap(x0, y1, w01) + tap(x1, y0, w10) + tap(x1, y1, w11)
    return out.reshape(out_shape)

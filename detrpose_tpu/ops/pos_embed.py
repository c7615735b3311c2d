"""Sinusoidal positional embeddings (decoder query pos + encoder 2D pos).

Reference semantics:
  * decoder keypoint sine embedding: src/models/detrpose/transformer.py:518-540
  * AIFI encoder sine-HW embedding: src/models/detrpose/hybrid_encoder.py:431-460

Both are deterministic functions of static shapes; under jit at a fixed
resolution they constant-fold, matching the reference's precomputed buffers.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _interleave_sin_cos(x: jax.Array) -> jax.Array:
    """stack((x[..., 0::2].sin(), x[..., 1::2].cos()), -1).flatten(-2)."""
    s = jnp.sin(x[..., 0::2])
    c = jnp.cos(x[..., 1::2])
    return jnp.stack([s, c], axis=-1).reshape(x.shape[:-1] + (-1,))


def sine_embedding_2d(pos: jax.Array, hidden_dim: int) -> jax.Array:
    """Decoder query positional embedding for normalized (x, y) positions.

    Args:
      pos: (..., 2) positions in [0, 1], last dim = (x, y).
      hidden_dim: output embedding width (reference uses the model width).

    Returns:
      (..., hidden_dim) embedding, ordered (y-part, x-part).
    """
    half = hidden_dim // 2
    i = np.arange(half, dtype=np.float32)
    dim_t = jnp.asarray(10000.0 ** (2.0 * (i // 2) / half))
    scale = 2.0 * math.pi
    px = pos[..., 0:1] * scale / dim_t
    py = pos[..., 1:2] * scale / dim_t
    return jnp.concatenate([_interleave_sin_cos(py), _interleave_sin_cos(px)], axis=-1)


def sine_hw_position_embedding(
    w: int,
    h: int,
    hidden_dim: int,
    temperature_w: float = 20.0,
    temperature_h: float = 20.0,
) -> jax.Array:
    """2D sine position embedding for an (h, w) token grid.

    Returns (1, h*w, 2*hidden_dim) — callers pass hidden_dim = model_dim // 2 so
    the output matches the model width (reference: hybrid_encoder.py:424-428).
    """
    scale = 2.0 * math.pi
    eps = 1e-6
    grid_w = np.arange(1, int(w) + 1, dtype=np.float32)
    grid_h = np.arange(1, int(h) + 1, dtype=np.float32)
    gh, gw = np.meshgrid(grid_h, grid_w, indexing="ij")  # (h, w)
    gw = gw / (int(w) + eps) * scale
    gh = gh / (int(h) + eps) * scale

    i = np.arange(hidden_dim, dtype=np.float32)
    dim_tx = temperature_w ** (2.0 * (i // 2) / hidden_dim)
    dim_ty = temperature_h ** (2.0 * (i // 2) / hidden_dim)

    pos_x = _interleave_sin_cos(jnp.asarray(gw[..., None] / dim_tx))
    pos_y = _interleave_sin_cos(jnp.asarray(gh[..., None] / dim_ty))
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)  # (h, w, 2*hidden_dim)
    return pos.reshape(1, h * w, -1)

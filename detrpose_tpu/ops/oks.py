"""Object Keypoint Similarity (OKS) math.

Reference semantics: src/misc/keypoint_loss.py:5-20 (oks_overlaps) and the
per-dataset sigma tables (keypoint_loss.py:49-64). Inputs use the reference's
split layout: Z = interleaved (x, y) pairs, V = per-keypoint visibility.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import keypoint_sigmas

__all__ = ["oks", "keypoint_sigmas"]


def oks(
    z_pred: jax.Array,
    z_gt: jax.Array,
    v_gt: jax.Array,
    area: jax.Array,
    num_keypoints: int,
    eps: float = 1e-6,
) -> jax.Array:
    """OKS between matched prediction/GT keypoint sets.

    Args:
      z_pred: (N, 2K) predicted keypoints, interleaved (x, y), normalized.
      z_gt:   (N, 2K) ground-truth keypoints, same layout.
      v_gt:   (N, K) visibility weights (0 = not annotated).
      area:   (N,) instance area (normalized, as stored in targets).

    Returns:
      (N,) OKS in [0, 1].
    """
    sig = jnp.asarray(keypoint_sigmas(num_keypoints))
    var = (2.0 * sig) ** 2
    kp = z_pred.reshape(-1, num_keypoints, 2)
    kg = z_gt.reshape(-1, num_keypoints, 2)
    d2 = (kp[..., 0] - kg[..., 0]) ** 2 + (kp[..., 1] - kg[..., 1]) ** 2
    e = d2 / (area[:, None] * var[None, :] * 2.0)
    sim = jnp.exp(-e) * v_gt
    return sim.sum(axis=1) / (v_gt.sum(axis=1) + eps)

"""Object Keypoint Similarity (OKS) math.

Reference semantics: src/misc/keypoint_loss.py:5-20 (oks_overlaps) and the
per-dataset sigma tables (keypoint_loss.py:49-64). Inputs use the reference's
split layout: Z = interleaved (x, y) pairs, V = per-keypoint visibility.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_SIGMAS_17 = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07,
     1.07, 0.87, 0.87, 0.89, 0.89],
    dtype=np.float32,
) / 10.0
_SIGMAS_14 = np.array(
    [0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89,
     0.79, 0.79],
    dtype=np.float32,
) / 10.0
_SIGMAS_3 = np.array([1.07, 1.07, 0.67], dtype=np.float32) / 10.0


def keypoint_sigmas(num_keypoints: int) -> np.ndarray:
    """Per-keypoint COCO/CrowdPose falloff sigmas."""
    if num_keypoints == 17:
        return _SIGMAS_17
    if num_keypoints == 14:
        return _SIGMAS_14
    if num_keypoints == 3:
        return _SIGMAS_3
    raise ValueError(f"Unsupported keypoints number {num_keypoints}")


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

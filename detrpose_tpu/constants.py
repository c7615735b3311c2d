"""JAX-free shared constants: per-keypoint OKS falloff sigmas.

Reference: src/misc/keypoint_loss.py:49-64 (sigma tables for 17/14/3
keypoints). Lives at the package top level, outside ``ops``, so host-side
consumers (the data workers' CDN builder and the evaluator) can import it
without triggering ``ops/__init__``'s jax imports — a per-epoch forkserver
data worker must not pay a jax import to fetch a numpy table.
"""
from __future__ import annotations

import numpy as np

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

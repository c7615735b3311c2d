"""NMS-free top-k decode of model outputs.

Reference: src/models/detrpose/postprocesses.py:6-45. Pure function — it jits
into the same XLA program as the model so decode happens on device.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def postprocess(
    outputs: Dict[str, jax.Array],
    target_sizes: jax.Array,  # (B, 2) original (w, h) per image
    num_select: int = 60,
    num_body_points: int = 17,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode (scores, labels, keypoints) from raw model outputs.

    Returns:
      scores:    (B, num_select)
      labels:    (B, num_select) int32
      keypoints: (B, num_select, K, 3) — (x, y, visibility=1) in original
                 image pixels.
    """
    logits = outputs["pred_logits"]          # (B, nq, C)
    kpts = outputs["pred_keypoints"]         # (B, nq, 2K) normalized
    B, nq, C = logits.shape
    K = num_body_points

    prob = jax.nn.sigmoid(logits).reshape(B, nq * C)
    scores, topk_idx = jax.lax.top_k(prob, num_select)
    topk_query = topk_idx // C
    labels = topk_idx % C

    sel = jnp.take_along_axis(kpts, topk_query[..., None], axis=1)  # (B, ns, 2K)
    sel = sel.reshape(B, num_select, K, 2)
    sel = sel * target_sizes[:, None, None, :]
    vis = jnp.ones_like(sel[..., :1])
    return scores, labels, jnp.concatenate([sel, vis], axis=-1)

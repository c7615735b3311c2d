"""Small shared numeric helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Logit with the reference's clamping (src/models/detrpose/utils.py:133-137)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)

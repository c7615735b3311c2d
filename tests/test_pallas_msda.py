"""Numerical equivalence: Pallas MSDA kernel vs the XLA-gather implementation.

Runs the kernel in interpreter mode (no TPU needed); the real-hardware
performance comparison lives in tools/pallas_bench.py.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from detrpose_tpu.ops.ms_deform_attn import ms_deform_attn
from detrpose_tpu.ops.pallas import ms_deform_attn_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_msda_matches_xla(seed, monkeypatch):
    # interpreter mode executes the scalar gather loop in python — keep the
    # tile small so the test stays fast
    import detrpose_tpu.ops.pallas.msda as msda_mod

    monkeypatch.setattr(msda_mod, "_TQ", 16)
    rng = np.random.default_rng(seed)
    B, Lq, nH, nP, dh = 1, 12, 2, 2, 8
    shapes = [(8, 8), (4, 4)]
    nL = len(shapes)
    value_levels = [
        jnp.asarray(rng.normal(size=(B, H, W, nH, dh)).astype(np.float32))
        for H, W in shapes
    ]
    # locations straddling borders to exercise the zero-padding path
    loc = rng.uniform(-0.15, 1.15, (B, Lq, nH, nL, nP, 2)).astype(np.float32)
    aw = rng.random((B, Lq, nH, nL, nP)).astype(np.float32)
    aw = aw / aw.sum(axis=(-1, -2), keepdims=True)

    want = np.asarray(ms_deform_attn(value_levels, jnp.asarray(loc), jnp.asarray(aw)))
    got = np.asarray(ms_deform_attn_pallas(
        value_levels, jnp.asarray(loc), jnp.asarray(aw), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

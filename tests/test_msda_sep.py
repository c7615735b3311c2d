"""Separable-one-hot Pallas MSDA kernel (ops/pallas/msda_sep.py).

Equivalence target: the XLA gather path (ops/ms_deform_attn.py), itself
golden vs the reference's pure-torch core (test_msda_branch_golden.py).
The kernel quantizes bilinear weights and the stage-2 product to bf16, so
the tolerance is the bf16 noise floor, not exactness.

Runs in interpret mode on CPU (the compiled kernel is exercised on TPU by
tools_local_msda_variants.py and the bench path).
"""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import detrpose_tpu.ops.ms_deform_attn  # noqa: F401 — register the module
from detrpose_tpu.ops.pallas.msda_sep import (ms_deform_attn_sep,
                                              ms_deform_attn_fast)

_XLA = sys.modules["detrpose_tpu.ops.ms_deform_attn"]


def _mk(B=2, Lq=50, nH=8, nP=4, dh=32, shapes=((16, 16), (8, 8), (4, 4)),
        seed=0, lo=-0.1, hi=1.1):
    rng = np.random.default_rng(seed)
    nL = len(shapes)
    vals = [jnp.asarray(rng.normal(size=(B, H, W, nH, dh)), jnp.bfloat16)
            for H, W in shapes]
    loc = jnp.asarray(rng.uniform(lo, hi, (B, Lq, nH, nL, nP, 2)), jnp.float32)
    aw = rng.random((B, Lq, nH, nL, nP)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(-1, -2), keepdims=True))
    return vals, loc, aw


def _gather_ref(vals, loc, aw):
    os.environ["MSDA_LEVEL_SAMPLER"] = "corner"
    os.environ["MSDA_ONEHOT_MAX_HW"] = "0"
    try:
        return np.asarray(_XLA.ms_deform_attn(vals, loc, aw),
                          dtype=np.float32)
    finally:
        os.environ.pop("MSDA_LEVEL_SAMPLER", None)
        os.environ.pop("MSDA_ONEHOT_MAX_HW", None)


@pytest.mark.parametrize("Lq", [50, 128, 135])
def test_sep_matches_gather(Lq):
    # 135*4=540 points exercises the point-tile padding (TP=512 -> 2 tiles)
    vals, loc, aw = _mk(Lq=Lq)
    ref = _gather_ref(vals, loc, aw)
    out = np.asarray(ms_deform_attn_sep(vals, loc, aw, interpret=True),
                     dtype=np.float32)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 0.01 * scale + 1e-4


def test_sep_out_of_range_zero_padding():
    # samples far outside the map must contribute exactly zero (grid_sample
    # zeros padding); the hat-function weights guarantee it structurally
    vals, loc, aw = _mk(lo=1.5, hi=3.0)
    out = np.asarray(ms_deform_attn_sep(vals, loc, aw, interpret=True),
                     dtype=np.float32)
    assert np.abs(out).max() == 0.0


def test_fast_grads_match_xla_path():
    # custom_vjp backward == gradients of the XLA path
    vals, loc, aw = _mk(B=1, Lq=16, shapes=((8, 8), (4, 4), (2, 2)))

    # forward of the custom_vjp primitive uses the kernel — interpret mode
    # is not plumbed through the vjp wrapper, so substitute the sep forward
    # only for the value check and take grads of both formulations directly.
    def loss_fast(loc, aw):
        return jnp.sum(jnp.square(ms_deform_attn_fast(list(vals), loc, aw)
                                  .astype(jnp.float32)))

    def loss_xla(loc, aw):
        return jnp.sum(jnp.square(_XLA.ms_deform_attn(vals, loc, aw)
                                  .astype(jnp.float32)))

    if jax.default_backend() != "tpu":
        # the compiled kernel needs a TPU; on CPU verify the vjp WIRING by
        # checking the registered bwd reproduces XLA grads given the same
        # upstream cotangent
        from detrpose_tpu.ops.pallas import msda_sep as mod
        out, vjp_x = jax.vjp(lambda l, a: _XLA.ms_deform_attn(vals, l, a),
                             loc, aw)
        g = jnp.ones_like(out)
        got = mod._fast_bwd((list(vals), loc, aw), g)
        want_v, want_l, want_a = jax.vjp(
            lambda v, l, a: _XLA.ms_deform_attn(v, l, a),
            list(vals), loc, aw)[1](g)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want_l),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want_a),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(got[0], want_v):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        return

    ga = jax.grad(loss_fast, argnums=(0, 1))(loc, aw)
    gb = jax.grad(loss_xla, argnums=(0, 1))(loc, aw)
    for a, b in zip(ga, gb):
        diff = np.abs(np.asarray(a) - np.asarray(b)).max()
        scale = np.abs(np.asarray(b)).max() + 1e-6
        assert diff <= 0.02 * scale

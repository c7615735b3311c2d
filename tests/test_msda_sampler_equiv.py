"""The two MSDA level-sampler implementations are interchangeable.

`ops/ms_deform_attn.py` carries two gather strategies for the large pyramid
levels (selected by MSDA_LEVEL_SAMPLER, default "corner"):

  * "corner" — four independent row gathers, one per bilinear corner
    (d_head=32-wide rows; sub-lane on TPU).
  * "patch"  — one row gather over a prebuilt 2x2-corner patch table whose
    rows are 4*d_head = 128 wide (a full TPU lane tile; measured ~4x faster
    gathers on the sandbox accelerator).

Both must produce identical results — forward AND backward, including
sampling locations far outside the feature map (where grid_sample's
zeros-padding semantics apply; reference src/models/detrpose/
ms_deform_attn.py:145-193). This pins the invariant so either path can be
benchmarked or made default without numerics risk.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.ops.ms_deform_attn import ms_deform_attn

B, LQ, NH, NP, DH = 2, 37, 8, 4, 32
# 17*23=391 and 40*13=520 exceed the one-hot threshold (256) -> gather path.
LEVELS = [(17, 23), (40, 13)]


def _inputs(dtype=np.float32):
    rng = np.random.default_rng(42)
    vals = [jnp.asarray(rng.normal(size=(B, H, W, NH, DH)).astype(dtype))
            for H, W in LEVELS]
    # span far outside [0, 1]: exercises zeros-padding + the >1px-out corner
    # aliasing the patch path folds into its validity weights
    loc = jnp.asarray(
        rng.uniform(-1.5, 2.5, (B, LQ, NH, len(LEVELS), NP, 2)).astype(np.float32))
    aw = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(B, LQ, NH, len(LEVELS) * NP)).astype(np.float32)),
        -1).reshape(B, LQ, NH, len(LEVELS), NP)
    return vals, loc, aw


def _run(sampler, vals, loc, aw):
    old = os.environ.get("MSDA_LEVEL_SAMPLER")
    os.environ["MSDA_LEVEL_SAMPLER"] = sampler
    try:
        out = ms_deform_attn(vals, loc, aw)
        grads = jax.grad(
            lambda vs, l, a: (ms_deform_attn(vs, l, a) ** 2).sum(),
            argnums=(0, 1, 2))(vals, loc, aw)
    finally:
        if old is None:
            os.environ.pop("MSDA_LEVEL_SAMPLER", None)
        else:
            os.environ["MSDA_LEVEL_SAMPLER"] = old
    return out, grads


def test_patch_equals_corner_fwd_and_grad():
    vals, loc, aw = _inputs()
    o1, g1 = _run("corner", vals, loc, aw)
    o2, g2 = _run("patch", vals, loc, aw)
    np.testing.assert_allclose(o1, o2, atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(a, b, atol=1e-6 * scale, rtol=1e-6)


def test_patch_handles_exact_boundary_locations():
    """Samples exactly on pixel centers / edges (floor boundaries) agree."""
    vals, _, aw = _inputs()
    H, W = LEVELS[0]
    # locations that land exactly on corner boundaries: loc*W - 0.5 integral
    xs = (np.arange(NP) + 0.5) / W
    ys = (np.arange(NP) + 0.5) / H
    loc = np.zeros((B, LQ, NH, len(LEVELS), NP, 2), np.float32)
    loc[..., 0] = xs
    loc[..., 1] = ys
    # second level: exactly 0 and 1 (the outer edges)
    loc[:, :, :, 1, :, :] = np.tile(
        np.asarray([0.0, 1.0], np.float32), (NP, 1))[: NP].reshape(1, 1, 1, NP, 2)
    loc = jnp.asarray(loc)
    o1, _ = _run("corner", vals, loc, aw)
    o2, _ = _run("patch", vals, loc, aw)
    np.testing.assert_allclose(o1, o2, atol=1e-6)

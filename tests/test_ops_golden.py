"""Golden tests of detrpose_tpu.ops against PyTorch reference semantics.

These tests pin the numerics the whole model depends on (grid_sample corner
semantics, deformable-attention reduction, FDR weighting, OKS, sine
embeddings) to the exact behavior of the reference implementation.
"""
import importlib.util
import math
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from detrpose_tpu.ops import (
    bilinear_grid_sample,
    ms_deform_attn,
    weighting_function,
    integral,
    distance2pose,
    sine_embedding_2d,
    sine_hw_position_embedding,
    oks,
    inverse_sigmoid,
)

REF = "/root/reference/src/models/detrpose/ms_deform_attn.py"


def _load_ref_msda():
    spec = importlib.util.spec_from_file_location("ref_msda", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 7, 9, 5
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # Include far out-of-bounds, boundary, and interior points.
    grid = rng.uniform(-1.7, 1.7, size=(B, 11, 4, 2)).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [0.0, 0.0]

    ours = np.asarray(bilinear_grid_sample(jnp.asarray(feat), jnp.asarray(grid)))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    t_out = F.grid_sample(
        t_feat, torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=False,
    )  # (B, C, 11, 4)
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_ms_deform_attn_matches_reference_core():
    ref = _load_ref_msda()
    rng = np.random.default_rng(1)
    B, nH, dh = 2, 4, 8
    shapes = [(8, 12), (4, 6), (2, 3)]
    nL, nP, Lq = len(shapes), 3, 10

    values = [rng.standard_normal((B, h, w, nH, dh)).astype(np.float32) for h, w in shapes]
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, nH, nL, nP, 2)).astype(np.float32)
    aw = rng.standard_normal((B, Lq, nH, nL, nP)).astype(np.float32)
    aw = np.exp(aw) / np.exp(aw).reshape(B, Lq, nH, -1).sum(-1).reshape(B, Lq, nH, 1, 1)

    ours = np.asarray(
        ms_deform_attn([jnp.asarray(v) for v in values], jnp.asarray(loc), jnp.asarray(aw))
    )

    # Reference core wants per-level (B*nH, dh, H*W) values.
    t_values = [
        torch.from_numpy(v).permute(0, 3, 4, 1, 2).reshape(B * nH, dh, h * w)
        for v, (h, w) in zip(values, shapes)
    ]
    # Reference takes (N, Len_q, M, L, P, 2); ours is already (B, Lq, nH, nL, nP, 2).
    t_out = ref.ms_deform_attn_core_pytorch(
        t_values, shapes, torch.from_numpy(loc), torch.from_numpy(aw)
    )
    np.testing.assert_allclose(ours, t_out.numpy(), rtol=1e-4, atol=1e-5)


def test_weighting_function_matches_reference():
    # Reference formula, recomputed independently (transformer.py:152-195).
    for reg_max, up, reg_scale in [(32, 0.5, 4.0), (32, 0.5, 8.0), (16, 0.5, 4.0)]:
        w = np.asarray(weighting_function(reg_max, up, reg_scale))
        assert w.shape == (reg_max + 1,)
        ub1 = abs(up) * abs(reg_scale)
        step = (ub1 + 1) ** (2 / (reg_max - 2))
        assert w[0] == pytest.approx(-2 * ub1)
        assert w[-1] == pytest.approx(2 * ub1)
        assert w[reg_max // 2] == 0.0
        assert w[reg_max // 2 + 1] == pytest.approx(step - 1)
        assert w[reg_max // 2 - 1] == pytest.approx(-(step - 1))
        assert np.all(np.diff(w) > 0)


def test_integral_expectation():
    rng = np.random.default_rng(2)
    reg_max = 32
    w = weighting_function(reg_max, 0.5, 4.0)
    x = rng.standard_normal((3, 5, 17, 2 * (reg_max + 1))).astype(np.float32)
    out = np.asarray(integral(jnp.asarray(x), w))
    assert out.shape == (3, 5, 17, 2)
    # Torch-equivalent computation.
    t = torch.from_numpy(x).reshape(-1, reg_max + 1)
    t = torch.softmax(t, dim=1) @ torch.from_numpy(np.asarray(w))
    ref = t.reshape(3, 5, 17, 2).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_distance2pose():
    pts = jnp.asarray([[0.5, 0.5]])
    dist = jnp.asarray([[0.4, -0.8]])
    out = np.asarray(distance2pose(pts, dist, 4.0))
    np.testing.assert_allclose(out, [[0.6, 0.3]], rtol=1e-6)


def test_sine_embedding_matches_reference_formula():
    hidden = 256
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, size=(2, 4, 17, 2)).astype(np.float32)
    ours = np.asarray(sine_embedding_2d(jnp.asarray(pos), hidden))
    assert ours.shape == (2, 4, 17, hidden)

    # Reference: transformer.py:518-527
    dim_t = torch.arange(hidden // 2, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / (hidden // 2))
    p = torch.from_numpy(pos)
    scale = 2 * math.pi
    px = p[..., 0:1] * scale / dim_t
    py = p[..., 1:2] * scale / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    ref = torch.cat((py, px), dim=3).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sine_hw_embedding_matches_reference_formula():
    w, h, hidden = 5, 7, 128
    tW = tH = 20.0
    ours = np.asarray(sine_hw_position_embedding(w, h, hidden // 2, tW, tH))
    assert ours.shape == (1, h * w, hidden)

    # Reference: hybrid_encoder.py:431-460 (hidden passed is model_dim // 2).
    half = hidden // 2
    grid_w = torch.arange(1, w + 1, dtype=torch.float32)
    grid_h = torch.arange(1, h + 1, dtype=torch.float32)
    gh, gw = torch.meshgrid(grid_h, grid_w, indexing="ij")
    scale = 2 * math.pi
    eps = 1e-6
    gw = gw / (w + eps) * scale
    gh = gh / (h + eps) * scale
    dim_tx = tW ** (2 * (torch.arange(half, dtype=torch.float32) // 2) / half)
    dim_ty = tH ** (2 * (torch.arange(half, dtype=torch.float32) // 2) / half)
    pos_x = gw[..., None] / dim_tx
    pos_y = gh[..., None] / dim_ty
    pos_x = torch.stack((pos_x[:, :, 0::2].sin(), pos_x[:, :, 1::2].cos()), dim=3).flatten(2)
    pos_y = torch.stack((pos_y[:, :, 0::2].sin(), pos_y[:, :, 1::2].cos()), dim=3).flatten(2)
    pos = torch.cat((pos_y, pos_x), dim=2).permute(2, 0, 1)
    ref = pos[None].flatten(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_oks_matches_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_kploss", "/root/reference/src/misc/keypoint_loss.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(4)
    N, K = 6, 17
    zp = rng.uniform(0, 1, (N, 2 * K)).astype(np.float32)
    zg = rng.uniform(0, 1, (N, 2 * K)).astype(np.float32)
    vg = (rng.uniform(size=(N, K)) > 0.3).astype(np.float32)
    area = rng.uniform(0.01, 0.2, (N,)).astype(np.float32)

    ours = np.asarray(oks(jnp.asarray(zp), jnp.asarray(zg), jnp.asarray(vg),
                          jnp.asarray(area), K))
    from detrpose_tpu.ops.oks import keypoint_sigmas
    ref = mod.oks_overlaps(
        torch.from_numpy(zp), torch.from_numpy(zg), torch.from_numpy(vg),
        torch.from_numpy(area), keypoint_sigmas(K),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_inverse_sigmoid_matches_reference():
    x = jnp.asarray([0.0, 1e-6, 0.3, 0.5, 0.999, 1.0, -0.2, 1.4])
    out = np.asarray(inverse_sigmoid(x))
    t = torch.tensor([0.0, 1e-6, 0.3, 0.5, 0.999, 1.0, -0.2, 1.4]).clamp(0, 1)
    ref = torch.log(t.clamp(min=1e-3) / (1 - t).clamp(min=1e-3)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

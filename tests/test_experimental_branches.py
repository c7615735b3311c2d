"""Experimental decoder branches: modulation / region sampling / global
context / FastKAN FFN (reference ms_deform_attn.py + transformer.py,
config-gated, default-off)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model


# Full-model compiles (~15-90 s each on the CPU test runner) — slow tier.
# Fast-tier coverage of every experimental branch's *semantics* lives in
# tests/test_msda_branch_golden.py (op-level goldens vs the live reference).
@pytest.mark.slow
@pytest.mark.parametrize("flags", [
    {"use_modulation": True},
    {"use_region_sampling": True, "region_kernel_size": 3},
    {"use_global_context": True},
    {"use_kan": True, "kan_grid": 3},
])
def test_branch_forward_finite(flags):
    cfg = model_config("n", **flags)
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(out["pred_keypoints"])).all()
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_modulation_matches_reference_core_semantics():
    """Folding modulation into attention weights == reference's elementwise
    multiply on the sampled values (linearity check)."""
    import importlib.util
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_msda2", "/root/reference/src/models/detrpose/ms_deform_attn.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from detrpose_tpu.ops.ms_deform_attn import ms_deform_attn

    rng = np.random.default_rng(0)
    B, nH, dh = 1, 2, 4
    shapes = [(6, 6), (3, 3)]
    nL, nP, Lq = 2, 2, 5
    values = [rng.standard_normal((B, h, w, nH, dh)).astype(np.float32)
              for h, w in shapes]
    loc = rng.uniform(0, 1, (B, Lq, nH, nL, nP, 2)).astype(np.float32)
    aw = rng.uniform(0.1, 1, (B, Lq, nH, nL, nP)).astype(np.float32)
    mod = rng.uniform(0.1, 1, (B, Lq, nH, nL, nP)).astype(np.float32)

    ours = np.asarray(ms_deform_attn(
        [jnp.asarray(v) for v in values], jnp.asarray(loc),
        jnp.asarray(aw * mod)))

    t_values = [torch.from_numpy(v).permute(0, 3, 4, 1, 2).reshape(B * nH, dh, h * w)
                for v, (h, w) in zip(values, shapes)]
    t_out = ref.ms_deform_attn_core_pytorch(
        t_values, shapes, torch.from_numpy(loc), torch.from_numpy(aw),
        sampling_modulation=torch.from_numpy(mod))
    np.testing.assert_allclose(ours, t_out.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("flags", [
    {"use_grouped_offsets": True, "num_groups": 2},
    {"use_grid_attention": True, "grid_num_points": 4},
    {"use_grid_attention": True, "grid_num_points": 4, "use_grid_offsets": True,
     "use_grid_fusion": False},
    {"use_grouped_offsets": True, "num_groups": 2, "use_modulation": True},
])
def test_grouped_and_grid_branches(flags):
    cfg = model_config("n", **flags)
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(out["pred_keypoints"])).all()
    assert np.isfinite(np.asarray(out["pred_logits"])).all()

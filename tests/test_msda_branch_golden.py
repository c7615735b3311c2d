"""Numerical parity of the EXPERIMENTAL MSDeformAttn branches vs the live
torch reference (VERDICT round-1 weak #8: these capability-parity claims
rested on smoke tests; modulation alone had a semantics test).

Each branch runs the reference module (refsrc ms_deform_attn.MSDeformAttn,
randomized weights) and our flax MSDeformAttn with the SAME weights on the
SAME inputs. Reference call conventions: value[l] = (N*nH, d_head, H*W);
reference_points = (N, nq, n_levels, 1+K, 2) pre-transpose
(transformer.py:417 -> ms_deform_attn.py:413 transpose+flatten).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader

D_MODEL, N_HEADS, N_LEVELS, N_POINTS = 64, 4, 2, 3
SHAPES = [(12, 12), (6, 6)]
B, LQ = 2, 10


def _build_pair(**flags):
    ref_loader.install_torchvision_stub()
    ref = ref_loader.load_reference()
    import importlib

    m = importlib.import_module("refsrc.models.detrpose.ms_deform_attn")
    torch.manual_seed(0)
    tmod = m.MSDeformAttn(
        d_model=D_MODEL, n_levels=N_LEVELS, n_heads=N_HEADS, n_points=N_POINTS,
        **flags)
    # randomize every parameter (defaults zero-init the offset/weight heads,
    # which would trivialize the branches)
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in tmod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    tmod.eval()

    from detrpose_tpu.models.decoder import MSDeformAttn

    flag_map = dict(
        use_modulation=flags.get("use_modulation", False),
        use_region_sampling=flags.get("use_region_sampling", False),
        region_kernel_size=flags.get("region_kernel_size", 1),
        use_global_context=flags.get("use_global_context", False),
        use_grouped_offsets=flags.get("num_groups", 1) > 1,
        num_groups=flags.get("num_groups", 1),
        use_grid_attention=flags.get("use_grid_attention", False),
        grid_num_points=flags.get("grid_num_points", 16),
        use_grid_offsets=flags.get("use_grid_offsets", False),
        use_grid_fusion=flags.get("use_grid_fusion", True),
    )
    jmod = MSDeformAttn(d_model=D_MODEL, n_levels=N_LEVELS, n_heads=N_HEADS,
                        n_points=N_POINTS, **flag_map)
    return tmod, jmod


def _convert_params(tmod, template):
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}

    def leaf(path, t):
        names = [getattr(p, "key", str(p)) for p in path]
        mod_name = names[-2] if len(names) > 1 else ""
        leaf_name = names[-1]
        if leaf_name == "mod_bias" and "mod_bias" in sd:
            return jnp.asarray(sd["mod_bias"])
        if leaf_name == "kernel":
            return jnp.asarray(sd[f"{mod_name}.weight"].T)
        if leaf_name == "bias" and f"{mod_name}.bias" in sd:
            return jnp.asarray(sd[f"{mod_name}.bias"])
        if mod_name == "mod_layernorm":
            tn = {"scale": "weight", "bias": "bias"}[leaf_name]
            return jnp.asarray(sd[f"mod_layernorm.{tn}"])
        raise KeyError(f"unmapped param {names}")

    return jax.tree_util.tree_map_with_path(leaf, template)


@pytest.mark.parametrize("flags", [
    dict(use_modulation=True),
    dict(use_grouped_offsets=True, num_groups=2),
    dict(use_global_context=True),
    dict(use_region_sampling=True, region_kernel_size=3),
    dict(use_grid_attention=True, grid_num_points=4, use_grid_fusion=True),
    dict(use_grid_attention=True, grid_num_points=4, use_grid_offsets=True,
         use_grid_fusion=False),
    dict(use_modulation=True, use_grouped_offsets=True, num_groups=2),
], ids=["modulation", "grouped", "global_ctx", "region", "grid_fuse",
        "grid_offsets", "modulation_grouped"])
def test_experimental_branch_parity(flags):
    tmod, jmod = _build_pair(**flags)
    rng = np.random.default_rng(0)
    dh = D_MODEL // N_HEADS

    query = rng.normal(size=(B, LQ, D_MODEL)).astype(np.float32)
    refs = rng.uniform(0.2, 0.8, (B, LQ, 2)).astype(np.float32)
    v_ours, v_torch = [], []
    for H, W in SHAPES:
        v = rng.normal(size=(B, H, W, N_HEADS, dh)).astype(np.float32)
        v_ours.append(jnp.asarray(v))
        v_torch.append(torch.from_numpy(
            v.transpose(0, 3, 4, 1, 2).reshape(B * N_HEADS, dh, H * W)))

    # reference_points: (B, nq=LQ, n_levels, K1=1, 2) -> transpose+flatten
    # inside the reference gives (B, LQ, n_levels, 2), same point per level
    t_refs = torch.from_numpy(
        np.broadcast_to(refs[:, :, None, None, :],
                        (B, LQ, N_LEVELS, 1, 2)).copy())

    with torch.no_grad():
        want = tmod(torch.from_numpy(query), t_refs, v_torch,
                    SHAPES).numpy()

    template = jax.eval_shape(
        lambda: jmod.init(jax.random.PRNGKey(0), jnp.asarray(query),
                          jnp.asarray(refs), v_ours, SHAPES))["params"]
    params = _convert_params(tmod, template)
    got = np.asarray(jmod.apply({"params": params}, jnp.asarray(query),
                                jnp.asarray(refs), v_ours, SHAPES))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

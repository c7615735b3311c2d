"""Deploy re-parameterisation: fused model must match the train-form model."""
import numpy as np

import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.utils.deploy import fuse_for_deploy


@pytest.mark.slow  # full-model compile
def test_fused_model_matches_trainform():
    cfg = model_config("n")
    model = build_model(cfg)
    model_dep = build_model(cfg, deploy=True)

    H = W = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # Make BN stats non-trivial so folding is actually exercised.
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda s: s + jnp.abs(jax.random.normal(jax.random.PRNGKey(1), s.shape)) * 0.1,
        variables["batch_stats"])

    out_ref = model.apply(variables, x, train=False)
    dep_vars = fuse_for_deploy(jax.device_get(variables))
    out_dep = model_dep.apply(jax.tree.map(jnp.asarray, dep_vars), x, train=False)

    np.testing.assert_allclose(
        np.asarray(out_dep["pred_keypoints"]), np.asarray(out_ref["pred_keypoints"]),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_dep["pred_logits"]), np.asarray(out_ref["pred_logits"]),
        rtol=1e-3, atol=1e-4)

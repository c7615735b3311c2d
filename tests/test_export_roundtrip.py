"""Deployment-export round trip: serialize the serving program via jax.export,
reload it cold, and match the live-jit outputs (reference deploy path:
tools/deployment/export_onnx.py -> onnx.checker; here the artifact is a
StableHLO program + fused params, tools/export.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import build_model, model_config
from detrpose_tpu.models import postprocess
from detrpose_tpu.tools.export import export_model, load_exported


@pytest.mark.slow
def test_export_reload_matches_live(tmp_path):
    size, K, B, res = "n", 17, 2, 256
    out = export_model(size, num_body_points=K, batch=B, res=res,
                       bf16=False, fuse=True, out_dir=str(tmp_path / "exp"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, res, res, 3)).astype(np.float32))
    ts = jnp.full((B, 2), 512.0, jnp.float32)

    run = load_exported(out)
    s_exp, l_exp, k_exp = run(x, ts)

    # live-jit reference with the same fused weights
    import pickle, os

    from detrpose_tpu.utils.deploy import fuse_for_deploy  # noqa: F401

    with open(os.path.join(out, "params.pkl"), "rb") as f:
        variables = pickle.load(f)
    model = build_model(model_config(size, num_body_points=K,
                                     dtype=jnp.float32), deploy=True)
    s_live, l_live, k_live = jax.jit(
        lambda v, img, sz: postprocess(model.apply(v, img, train=False), sz,
                                       num_body_points=K))(variables, x, ts)

    np.testing.assert_allclose(np.asarray(s_exp), np.asarray(s_live),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_exp), np.asarray(k_live),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(l_exp), np.asarray(l_live))

"""ResNet backbone wiring (reference src/nn/backbone/resnet.py:61-100 —
present-but-unused alternative to HGNetv2; here selectable via
model_config(backbone_name="resnet50"))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import build_model, model_config
from detrpose_tpu.models.resnet import ResNet


@pytest.mark.slow  # full-model compile
def test_resnet_feature_pyramid_shapes():
    model = ResNet(depth=50)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    outs = jax.jit(lambda v: model.apply(v, x))(variables)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]


@pytest.mark.slow
def test_detrpose_with_resnet_backbone():
    cfg = model_config("l", backbone_name="resnet50")
    assert tuple(cfg.in_channels) == (512, 1024, 2048)
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))()
    out = jax.jit(lambda v: model.apply(v, x, train=False))(variables)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["pred_keypoints"])).all()

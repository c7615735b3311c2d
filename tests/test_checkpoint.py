"""Orbax checkpoint round-trip of the TrainState."""
import numpy as np

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.parallel import init_train_state
from detrpose_tpu.train.optim import make_optimizer
from detrpose_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    cfg = model_config("n")
    model = build_model(cfg)
    tx = make_optimizer(
        jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=True))["params"])
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, 128, 128, 3)))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, epoch=7)

    # perturb then restore
    zeroed = state.replace(
        params=jax.tree.map(jnp.zeros_like, state.params), step=state.step + 99)
    restored, epoch = restore_checkpoint(path, zeroed)
    assert epoch == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)

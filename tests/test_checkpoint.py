"""Orbax checkpoint round-trip of the TrainState."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.parallel import init_train_state
from detrpose_tpu.train.optim import make_optimizer
from detrpose_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint


@pytest.mark.slow  # full-model compile
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


def _tiny_state(grad_accum=1):
    from detrpose_tpu.parallel.train_step import TrainState
    from detrpose_tpu.train.optim import EMA, make_optimizer

    params = {
        "backbone": {"bn": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))}},
        "head": {"kernel": jnp.full((4, 4), 2.0), "bias": jnp.zeros((4,))},
    }
    tx = make_optimizer(params, milestones=(10,), grad_accum_steps=grad_accum)
    return TrainState(
        step=jnp.asarray(5, jnp.int32), params=params, batch_stats={},
        opt_state=tx.init(params), ema=EMA.init(params))


def test_restore_falls_back_on_optimizer_mismatch(tmp_path):
    """Changing the optimizer between save and resume (here: enabling grad
    accumulation, which wraps the opt state in MultiSteps) must not abort —
    params/EMA/step restore, the optimizer restarts fresh (reference
    trainer.py:358-361 re-initializes with a warning)."""
    state = _tiny_state(grad_accum=1)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, epoch=3)

    template = _tiny_state(grad_accum=2)  # different opt_state structure
    template = template.replace(
        params=jax.tree.map(jnp.zeros_like, template.params))
    restored, epoch = restore_checkpoint(path, template)
    assert epoch == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.full((4, 4), 2.0))
    assert int(restored.step) == 5
    # optimizer state is the template's fresh MultiSteps structure
    assert jax.tree_util.tree_structure(restored.opt_state) == \
        jax.tree_util.tree_structure(template.opt_state)


def test_lr_is_pure_function_of_restored_step():
    """LR rebase on resume (reference trainer.py:343-377's override hack) is
    inherent here: the schedule reads the restored step and the CURRENT
    config, so editing milestones before resume takes effect immediately."""
    from detrpose_tpu.train.optim import multistep_schedule

    old = multistep_schedule(1e-4, milestones=(10,), gamma=0.1)
    new = multistep_schedule(1e-4, milestones=(3,), gamma=0.1)
    step = 5  # restored counter
    assert float(old(step)) == pytest.approx(1e-4)
    assert float(new(step)) == pytest.approx(1e-5)

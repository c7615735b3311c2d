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


def test_ema_tracks_batch_stats():
    """Reference ModelEMA EMAs every floating state_dict entry — BN running
    stats included (ema.py:55-67) — so EMA.update must blend batch_stats with
    the same warmup-ramped decay as the params."""
    from detrpose_tpu.train.optim import EMA

    params = {"w": jnp.ones((3,))}
    stats = {"bn": {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))}}
    ema = EMA.init(params, stats)
    np.testing.assert_array_equal(np.asarray(ema["batch_stats"]["bn"]["mean"]),
                                  np.zeros(3))
    new_stats = {"bn": {"mean": jnp.full((3,), 10.0), "var": jnp.ones((3,))}}
    ema2 = EMA.update(ema, {"w": jnp.full((3,), 5.0)}, decay=0.5, warmups=1,
                      batch_stats=new_stats)
    d = 0.5 * (1.0 - np.exp(-1.0))  # warmup-ramped decay at updates=1
    np.testing.assert_allclose(np.asarray(ema2["batch_stats"]["bn"]["mean"]),
                               np.full(3, (1 - d) * 10.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema2["params"]["w"]),
                               np.full(3, 1.0 * d + 5.0 * (1 - d)), rtol=1e-6)
    # updating without stats keeps the existing EMA stats untouched
    ema3 = EMA.update(ema2, {"w": jnp.ones((3,))}, decay=0.5, warmups=1)
    np.testing.assert_array_equal(
        np.asarray(ema3["batch_stats"]["bn"]["mean"]),
        np.asarray(ema2["batch_stats"]["bn"]["mean"]))


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

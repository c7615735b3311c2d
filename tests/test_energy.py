"""Energy-based refinement branch (experimental; reference transformer.py:731-901)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model


@pytest.mark.parametrize(
    "grad_energy",
    [pytest.param(False, marks=pytest.mark.slow),  # 90s eager CPU pass; the
     # True variant keeps energy-refinement coverage in the fast tier
     True])
def test_energy_refinement_forward(grad_energy):
    cfg = model_config("n", use_energy_refinement=True, energy_steps=2,
                       grad_energy=grad_energy, energy_decrease_weight=0.01)
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(out["pred_keypoints"])).all()
    assert np.isfinite(np.asarray(out["pred_logits"])).all()

    # refinement must actually change the outputs vs the vanilla model
    cfg0 = model_config("n")
    model0 = build_model(cfg0)
    out0 = model0.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(out["pred_keypoints"]),
                           np.asarray(out0["pred_keypoints"]))


@pytest.mark.slow  # full-model compile
def test_energy_refinement_train_grads():
    cfg = model_config("n", use_energy_refinement=True, energy_steps=1,
                       grad_energy=True, energy_decrease_weight=0.01)
    model = build_model(cfg)
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return (jnp.sum(out["pred_keypoints"] ** 2)
                + jnp.asarray(out["energy_reg_loss"]))

    g = jax.grad(loss)(variables["params"])
    e_layer = g["transformer"]["decoder"]["energy_layer"]
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(e_layer))
    assert np.isfinite(gnorm)
    step_g = g["transformer"]["decoder"]["energy_step_size"]
    assert np.isfinite(np.asarray(step_g)).all()

"""Energy-based refinement branch (experimental; reference transformer.py:731-901)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model


@pytest.mark.parametrize(
    "grad_energy",
    [pytest.param(False, marks=pytest.mark.slow),
     # both full-model variants are ~90s eager CPU passes; fast-tier
     # coverage comes from test_energy_refine_unit_toy below
     pytest.param(True, marks=pytest.mark.slow)])
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


@pytest.mark.parametrize(
    "grad_energy",
    [pytest.param(False, marks=pytest.mark.slow),  # raw-energy descent
     True])  # the jax.grad-descent variant carries the fast-tier coverage
def test_energy_refine_unit_toy(grad_energy):
    """Fast-tier energy coverage at toy dims: the refinement loop must run
    (both raw-energy and jax.grad descent), change the decoder outputs vs
    the identical non-energy decoder, and produce a finite regulariser.
    Reference semantics: transformer.py:731-901."""
    from detrpose_tpu.models.decoder import TransformerDecoder
    from detrpose_tpu.ops.fdr import weighting_function

    B, nq, K, d, H = 1, 4, 3, 32, 8
    kw = dict(num_layers=2, hidden_dim=d, num_body_points=K, d_ffn=32,
              n_levels=1, n_heads=2, n_points=2, num_classes=2, reg_max=8,
              reg_scale=4.0, lqe_hidden=16)
    dec = TransformerDecoder(use_energy_refinement=True, energy_steps=2,
                             grad_energy=grad_energy,
                             energy_decrease_weight=0.01, **kw)
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.standard_normal((B, nq, 1 + K, d)), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, nq, 1 + K, 2)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((B, H, H, d)), jnp.float32)
    vl = [feat.reshape(B, H, H, 2, d // 2)]
    project = weighting_function(8, 0.5, 4.0)
    def run(module, v):
        # jit per module: a tiny-dims compile beats thousands of eager-mode
        # CPU dispatches (the energy loop re-traces jax.grad per step eagerly)
        return jax.jit(lambda vv: module.apply(
            vv, tgt, ref, vl, [(H, H)], feat, project, None, False))(v)

    variables = jax.jit(lambda: dec.init(
        jax.random.PRNGKey(0), tgt, ref, vl, [(H, H)], feat, project,
        None, False))()
    out = run(dec, variables)
    poses, logits, energy_reg = out[0], out[1], out[-1]
    assert np.isfinite(np.asarray(poses)).all()
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(float(energy_reg))
    # refinement must actually move the outputs vs the vanilla decoder
    dec0 = TransformerDecoder(**kw)
    out0 = run(dec0, variables)
    assert not np.allclose(np.asarray(poses), np.asarray(out0[0]))


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

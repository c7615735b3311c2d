"""Gradient accumulation and non-finite-loss skip semantics of the train step.

VERDICT round-1 #5/#10 acceptance: 2 x accum(bs2) must equal one bs4 step
(reference engine.py:43-60 runs sequential micro-batches into one
optimizer.step), and a NaN loss must not poison the state.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.parallel import init_train_state, make_train_step
from detrpose_tpu.train.optim import make_optimizer

HW = 128  # N needs >= 60 anchors: strides 16/32 -> 80 at 128px
K = 17


def _micro_batch(rng, B=2, G=3):
    kxy = rng.uniform(0.2, 0.8, (B, G, K, 2)).astype(np.float32)
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)),
        "targets": {
            "labels": jnp.zeros((B, G), jnp.int32),
            "boxes": jnp.asarray(np.concatenate(
                [kxy.mean(2), np.full((B, G, 2), 0.25, np.float32)], -1)),
            "keypoints": jnp.asarray(np.concatenate(
                [kxy.reshape(B, G, 2 * K), np.ones((B, G, K), np.float32)], -1)),
            "area": jnp.full((B, G), 0.05, jnp.float32),
            "valid": jnp.ones((B, G), bool),
        },
    }


def _concat(b1, b2):
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), b1, b2)


@pytest.mark.slow
def test_two_micro_steps_equal_one_full_step():
    cfg = model_config("n")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    micro = _micro_batch(rng)
    full = _concat(micro, micro)  # duplicated halves: grads must agree exactly

    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))["params"]

    def run(grad_accum, batches):
        tx = make_optimizer(params_shape, milestones=(1000,),
                            grad_accum_steps=grad_accum)
        state = init_train_state(model, tx, jax.random.PRNGKey(0),
                                 jnp.zeros((1, HW, HW, 3)))
        step = jax.jit(make_train_step(
            model, tx, num_body_points=K, num_classes=cfg.num_classes,
            grad_accum_steps=grad_accum))
        mids = []
        for b in batches:
            state, metrics = step(state, b)
            mids.append(state)
        return state, metrics, mids

    s_accum, m_accum, mids = run(2, [micro, micro])
    s_full, m_full, _ = run(1, [full])

    # mid-accumulation micro step must NOT touch params (MultiSteps holds
    # the update until the k-th micro batch)
    init_params = init_train_state(
        model, make_optimizer(params_shape, milestones=(1000,)),
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3))).params
    for a, b in zip(jax.tree.leaves(init_params),
                    jax.tree.leaves(mids[0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # identical optimizer update (MultiSteps averages micro-grads; the
    # normalizers agree because the halves are identical). adamw's g/sqrt(v)
    # flips sign on last-bit differences of near-zero grads (reduction order
    # bs2 vs bs4), so a handful of elements may differ by up to one full
    # update (~2*lr); a wiring bug (summed instead of averaged grads, wrong
    # normalizer) shifts essentially EVERY element, which is what we assert
    # against.
    n_tot = n_close = 0
    for pa, pf in zip(jax.tree.leaves(s_accum.params),
                      jax.tree.leaves(s_full.params)):
        a, f = np.asarray(pa, np.float64), np.asarray(pf, np.float64)
        np.testing.assert_allclose(a, f, rtol=0.1, atol=3e-4)  # <= 2 updates
        n_tot += a.size
        n_close += int((np.abs(a - f) <= 1e-5 + 1e-5 * np.abs(f)).sum())
    assert n_close / n_tot > 0.999, (n_close, n_tot)
    # losses match too (identical halves)
    np.testing.assert_allclose(float(m_accum["loss_total"]),
                               float(m_full["loss_total"]), rtol=1e-5)
    # EMA advanced exactly once in both runs
    assert int(s_accum.ema["updates"]) == int(s_full.ema["updates"]) == 1


@pytest.mark.slow
def test_nonfinite_loss_skips_update():
    cfg = model_config("n")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    good = _micro_batch(rng)
    bad = dict(good)
    bad["images"] = good["images"].at[0, 0, 0, 0].set(jnp.nan)

    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))["params"]
    tx = make_optimizer(params_shape, milestones=(1000,))
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, HW, HW, 3)))
    step = jax.jit(make_train_step(
        model, tx, num_body_points=K, num_classes=cfg.num_classes))

    new_state, metrics = step(state, bad)
    assert not bool(metrics["finite"])
    # params, opt state and EMA untouched; step counter advanced
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step) + 1
    assert int(new_state.ema["updates"]) == 0

    # and a good batch afterwards updates normally
    after, m2 = step(new_state, good)
    assert bool(m2["finite"])
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(after.params)))
    assert changed

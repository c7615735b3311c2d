"""Gradient accumulation, clipping and non-finite-loss skip semantics.

Reference semantics (src/solver/engine.py:43-85): micro-batch losses are NOT
divided by grad_accum_steps, so backward() accumulates the SUM of micro
gradients; clip_grad_norm_(0.1) clips that sum; optimizer.step() consumes the
clipped sum; ema.update runs once per optimizer step.

The equivalence property is *optimizer-level* (optax.MultiSteps + the
scale(k)/clip pre-chain in train/optim.py), so the heavy assertions run on toy
parameter trees in milliseconds. One shrunken-model test then proves the same
pipeline holds end-to-end through make_train_step (models are config-shrunk:
1 decoder layer, hidden 64 — the property does not depend on model size).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.parallel import init_train_state, make_train_step
from detrpose_tpu.train.optim import make_optimizer

HW = 64
K = 17

# Config-shrunk N: 1 decoder layer, hidden 64 — compiles in seconds, exercises
# the identical train-step/optimizer wiring as the full model.
_TOY = dict(num_decoder_layers=1, hidden_dim=64, enc_dim_feedforward=128,
            dec_dim_feedforward=128, num_queries=12, dec_n_points=2)


def _toy_params():
    return {"backbone": {"w": jnp.ones((4,))},
            "head": {"w": jnp.full((4,), 2.0)}}


# ------------------------------------------------------- optimizer-level


def test_accum_update_equals_adamw_clip_sum():
    """accum(g1, g2) must produce exactly adamw(clip(g1 + g2)) — the
    reference's sum-then-clip semantics (engine.py:43-85)."""
    params = _toy_params()
    tx = make_optimizer(params, clip_max_norm=0.1, milestones=(100,),
                        grad_accum_steps=2)
    st = tx.init(params)
    g1 = jax.tree.map(lambda p: jnp.full_like(p, 0.3), params)
    g2 = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)

    u1, st = tx.update(g1, st, params)
    # mid-accumulation: no parameter movement
    for leaf in jax.tree.leaves(u1):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    assert int(st.mini_step) == 1

    u2, st = tx.update(g2, st, params)
    assert int(st.mini_step) == 0  # apply boundary

    tx1 = make_optimizer(params, clip_max_norm=0.1, milestones=(100,),
                         grad_accum_steps=1)
    gsum = jax.tree.map(lambda a, b: a + b, g1, g2)
    us, _ = tx1.update(gsum, tx1.init(params), params)
    for a, b in zip(jax.tree.leaves(u2), jax.tree.leaves(us)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_clip_engages_on_sum_not_mean():
    """With ||g_micro|| just below the threshold, the SUM exceeds it: the
    reference clips (mean-clipping would not) — the exact deviation flagged in
    round 2 for the shipped L recipe (grad_accum 2, clip 0.1)."""
    params = {"head": {"w": jnp.ones((4,))}}
    clip = 0.1
    # per-micro grad norm 0.08 < clip; sum norm 0.16 > clip
    g = jax.tree.map(lambda p: jnp.full_like(p, 0.08 / 2.0), params)

    tx = make_optimizer(params, clip_max_norm=clip, milestones=(100,),
                        grad_accum_steps=2)
    st = tx.init(params)
    _, st = tx.update(g, st, params)
    u, _ = tx.update(g, st, params)

    # ground truth: adamw(clip(sum)); with clipping active the inner grad has
    # norm exactly `clip`
    inner = optax.chain(optax.clip_by_global_norm(clip),
                        optax.adamw(1e-4, b1=0.9, b2=0.999, weight_decay=1e-4))
    gsum = jax.tree.map(lambda a: 2.0 * a, g)
    uref, _ = inner.update(gsum, inner.init(params), params)
    np.testing.assert_allclose(np.asarray(u["head"]["w"]),
                               np.asarray(uref["head"]["w"]), rtol=1e-6)


def test_multistep_milestones_count_optimizer_steps():
    """MultiSteps' gradient_step (not micro count) is what the LR schedule
    sees: 4 micro updates with k=2 advance gradient_step by 2."""
    params = _toy_params()
    tx = make_optimizer(params, milestones=(100,), grad_accum_steps=2)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    for _ in range(4):
        _, st = tx.update(g, st, params)
    assert int(st.gradient_step) == 2


# ----------------------------------------------------------- model-level


@pytest.mark.slow
def test_two_micro_steps_equal_one_summed_step():
    """End-to-end through make_train_step on the shrunken model: accumulating
    two distinct micro batches equals one optimizer step on the summed raw
    gradients (reference engine.py:43-85)."""
    cfg = model_config("n", **_TOY)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    micro1 = _micro_batch(rng)
    micro2 = _micro_batch(rng)

    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))["params"]
    tx = make_optimizer(params_shape, milestones=(1000,), grad_accum_steps=2)
    state0 = init_train_state(model, tx, jax.random.PRNGKey(0),
                              jnp.zeros((1, HW, HW, 3)))
    step = jax.jit(make_train_step(
        model, tx, num_body_points=K, num_classes=cfg.num_classes,
        grad_accum_steps=2))
    mid, _ = step(state0, micro1)
    # mid-accumulation micro step must NOT touch params
    for a, b in zip(jax.tree.leaves(state0.params),
                    jax.tree.leaves(mid.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    final, _ = step(mid, micro2)
    assert int(final.ema["updates"]) == 1  # EMA advanced exactly once

    # reference ground truth: raw grads of each micro loss, summed, fed to the
    # k=1 optimizer (clip + adamw)
    from detrpose_tpu.train.criterion import criterion as criterion_fn

    def loss_fn(params, batch, batch_stats):
        out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             batch["images"], train=True,
                             mutable=["batch_stats"])
        losses = criterion_fn(out, dict(batch["targets"]), K, cfg.num_classes)
        total = sum(v.astype(jnp.float32) for v in losses.values())
        return total + jnp.asarray(out.get("energy_reg_loss", 0.0), jnp.float32)

    grad = jax.jit(jax.grad(loss_fn))
    g1 = grad(state0.params, micro1, state0.batch_stats)
    # micro 2's grads are taken at the SAME params (MultiSteps holds updates),
    # but batch_stats advanced after micro 1 — replay that
    _, mut = jax.jit(lambda p, b, s: model.apply(
        {"params": p, "batch_stats": s}, b["images"], train=True,
        mutable=["batch_stats"]))(state0.params, micro1, state0.batch_stats)
    g2 = grad(state0.params, micro2, mut["batch_stats"])
    gsum = jax.tree.map(lambda a, b: a + b, g1, g2)

    tx1 = make_optimizer(params_shape, milestones=(1000,), grad_accum_steps=1)
    uref, _ = tx1.update(gsum, tx1.init(state0.params), state0.params)
    pref = optax.apply_updates(state0.params, uref)

    for a, b in zip(jax.tree.leaves(final.params), jax.tree.leaves(pref)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-4, atol=1e-7)


@pytest.mark.slow
def test_nonfinite_loss_skips_update_and_keeps_ema_cadence():
    """A NaN micro batch must leave params/EMA untouched, and with
    grad_accum>1 the EMA must still fire exactly at real apply boundaries
    afterwards (the round-2 mini_step desync bug)."""
    cfg = model_config("n", **_TOY)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    good = _micro_batch(rng)
    bad = dict(good)
    bad["images"] = good["images"].at[0, 0, 0, 0].set(jnp.nan)

    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))["params"]
    tx = make_optimizer(params_shape, milestones=(1000,), grad_accum_steps=2)
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, HW, HW, 3)))
    step = jax.jit(make_train_step(
        model, tx, num_body_points=K, num_classes=cfg.num_classes,
        grad_accum_steps=2))

    # micro 1 is bad: whole update skipped, mini_step reverted
    state1, metrics = step(state, bad)
    assert not bool(metrics["finite"])
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state1.step) == int(state.step) + 1
    assert int(state1.ema["updates"]) == 0

    # two good micros: the apply boundary lands on the SECOND one even though
    # state.step is now offset by the skipped micro
    state2, m2 = step(state1, good)
    assert bool(m2["finite"])
    assert int(state2.ema["updates"]) == 0  # mid-accumulation
    state3, _ = step(state2, good)
    assert int(state3.ema["updates"]) == 1  # EMA fired at the true boundary
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(state3.params)))
    assert changed


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

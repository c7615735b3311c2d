"""Sharded training step: forward (train) + criterion + AdamW + EMA under pjit.

Replaces the reference's engine.train_one_epoch inner loop
(src/solver/engine.py:37-97): autocast -> bf16 module dtype; GradScaler -> not
needed in bf16; DDP gradient all-reduce -> implicit psum from pjit; SyncBN ->
global batch-stat reduction under pjit; grad clip + EMA identical.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..train.criterion import criterion as criterion_fn
from ..train.optim import EMA


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[Any] = None


def init_train_state(model, tx, rng, sample_batch, use_ema: bool = True,
                     dn=None) -> TrainState:
    # jit the init: eager op-by-op dispatch of the full model is minutes on
    # CPU backends; compiled it is one program.
    variables = jax.jit(
        lambda r, x, d: model.init(r, x, train=True, dn=d)
    )(rng, sample_batch, dn)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema=(EMA.init(params, variables.get("batch_stats", {}))
             if use_ema else None),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    num_body_points: int,
    num_classes: int = 2,
    weight_dict: Optional[Dict[str, float]] = None,
    matcher_backend: str = "auction",
    ema_decay: float = 0.9999,
    ema_warmups: int = 2000,
    use_ema: bool = True,
    grad_accum_steps: int = 1,
    losses=("vfl", "keypoints"),
) -> Callable[[TrainState, Dict[str, Any]], tuple]:
    """Returns a jittable (state, batch) -> (state, metrics) step.

    batch = {"images": (B,H,W,3), "targets": {labels, boxes, keypoints, area,
    valid}, optionally "dn": output of train/cdn.build_cdn converted to jnp}.

    With ``grad_accum_steps > 1`` the optimizer must be an optax.MultiSteps
    (train/optim.py) fed one micro-batch per call (the reference runs
    sequential micro-batches, engine.py:43-60); the EMA then only advances on
    real optimizer steps, matching the reference's per-step ema.update.

    A non-finite loss skips the whole update (params/opt/EMA keep their old
    values) and is reported in metrics["finite"] — stronger than the
    reference, which detects the NaN but only after the optimizer stepped
    (engine.py:68-71 aborts before stepping; DDP has no skip path).
    """

    def step(state: TrainState, batch: Dict[str, Any]):
        dn = batch.get("dn")

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], train=True, dn=dn, mutable=["batch_stats"],
            )
            targets = dict(batch["targets"])
            if dn is not None:
                targets["dn_match"] = dn["dn_match"]
            losses_d = criterion_fn(
                out, targets, num_body_points, num_classes,
                weight_dict=weight_dict, matcher_backend=matcher_backend,
                losses=losses,
            )
            total = jnp.asarray(0.0, jnp.float32)
            for v in losses_d.values():
                total = total + v.astype(jnp.float32)
            # energy regulariser pass-through (reference: engine.py:55
            # `+ model.module.layer_loss`)
            total = total + jnp.asarray(out.get("energy_reg_loss", 0.0), jnp.float32)
            return total, (losses_d, mut["batch_stats"])

        (total, (loss_terms, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        finite = jnp.isfinite(total)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if state.ema is not None and use_ema:
            if grad_accum_steps > 1:
                # EMA tracks *optimizer* steps (reference: engine.py:95 updates
                # once per optimizer.step, after the micro-batch loop). Derive
                # the boundary from the MultiSteps state itself — mini_step
                # wraps to 0 exactly when the inner optimizer applied — so a
                # skipped (non-finite) update, which reverts mini_step but
                # still advances state.step, cannot desync the EMA cadence.
                is_opt_step = new_opt.mini_step == 0
                new_ema = jax.lax.cond(
                    is_opt_step,
                    lambda: EMA.update(state.ema, new_params, ema_decay,
                                       ema_warmups, batch_stats=new_stats),
                    lambda: state.ema)
            else:
                new_ema = EMA.update(state.ema, new_params, ema_decay,
                                     ema_warmups, batch_stats=new_stats)
        else:
            new_ema = state.ema

        proposed = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema=new_ema,
        )
        # Skip the whole update on a non-finite loss (keep the step counter).
        kept = state.replace(step=state.step + 1)
        new_state = jax.tree.map(
            lambda a, b: jnp.where(finite, a, b), proposed, kept)
        metrics = {"loss_total": total, "finite": finite, **loss_terms}
        return new_state, metrics

    return step

"""Orbax checkpointing of the TrainState.

Reference semantics: the checkpoint dict {model, ema, optimizer, lr_scheduler,
epoch} written every epoch / on new-best (src/solver/trainer.py:223-238), with
full-state resume (:343-379). Here the whole TrainState pytree (params,
batch_stats, optimizer state, EMA, step) round-trips through orbax.
"""
from __future__ import annotations

import os
from typing import Any, Tuple

import jax


def save_checkpoint(path: str, state: Any, epoch: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    # Gather to host to keep checkpoints mesh-independent.
    host_state = jax.tree.map(lambda x: jax.device_get(x), state)
    ckptr.save(path, {"state": host_state, "epoch": epoch}, force=True)
    ckptr.wait_until_finished()


def restore_variables(path: str, variables_template: Any,
                      prefer_ema: bool = True) -> Any:
    """Restore eval variables {'params','batch_stats'} from an orbax TrainState
    checkpoint WITHOUT constructing an optimizer — the inference/export CLI
    path (reference workflow: torch_inf.py -r checkpoint.pth, which prefers the
    EMA weights, tools/inference/torch_inf.py:141-151).
    """
    import orbax.checkpoint as ocp

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    rs = raw["state"]
    ema = rs.get("ema")
    use_ema = prefer_ema and ema is not None
    params = ema["params"] if use_ema else rs["params"]
    # the EMA stream carries its own EMA'd BN stats (reference ModelEMA EMAs
    # the full state_dict); older checkpoints lack them -> live stats
    stats = (ema.get("batch_stats") or rs["batch_stats"]) if use_ema \
        else rs["batch_stats"]

    def cast(t, v):
        return jax.numpy.asarray(v, t.dtype)

    return {
        "params": jax.tree.map(cast, variables_template["params"], params),
        "batch_stats": jax.tree.map(
            cast, variables_template["batch_stats"], stats),
    }


def restore_checkpoint(path: str, template: Any) -> Tuple[Any, int]:
    """Restore a TrainState; falls back to params/EMA-only on optimizer-state
    mismatch (reference: src/solver/trainer.py:358-361 re-initializes the
    optimizer with a warning when its state_dict does not match).

    LR rebase needs no special handling (reference trainer.py:343-377's
    "override resumed lr drop" hack): the LR here is a pure function of the
    restored step and the *current* config's schedule, so changing milestones
    or base LR before resume takes effect immediately.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(
            path,
            jax.tree.map(lambda x: x, {"state": template, "epoch": 0}),
        )
        return restored["state"], int(restored["epoch"])
    except Exception as full_err:  # structure/shape mismatch
        try:
            partial_tpl = {
                "params": template.params,
                "batch_stats": template.batch_stats,
                "ema": template.ema,
                "step": template.step,
            }
            ckptr2 = ocp.PyTreeCheckpointer()
            raw = ckptr2.restore(path)
            rs = raw["state"]
            # pre-batch_stats-EMA checkpoints: seed the EMA stats stream
            # from the live running stats
            if rs.get("ema") is not None and "batch_stats" not in rs["ema"]:
                rs["ema"] = dict(rs["ema"], batch_stats=rs["batch_stats"])
            restored_state = template.replace(
                params=jax.tree.map(
                    lambda t, v: jax.numpy.asarray(v, t.dtype),
                    partial_tpl["params"], rs["params"]),
                batch_stats=jax.tree.map(
                    lambda t, v: jax.numpy.asarray(v, t.dtype),
                    partial_tpl["batch_stats"], rs["batch_stats"]),
                ema=(jax.tree.map(
                    lambda t, v: jax.numpy.asarray(v, t.dtype),
                    partial_tpl["ema"], rs["ema"])
                     if partial_tpl["ema"] is not None and rs.get("ema") is not None
                     else template.ema),
                step=jax.numpy.asarray(rs.get("step", 0), jax.numpy.int32),
            )
            print("WARNING: optimizer state in checkpoint does not match the "
                  "current optimizer; restored params/EMA only and kept a "
                  "fresh optimizer (reference trainer.py:358-361).")
            return restored_state, int(raw.get("epoch", 0))
        except Exception:
            raise full_err

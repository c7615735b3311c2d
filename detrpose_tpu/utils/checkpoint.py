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


def restore_checkpoint(path: str, template: Any) -> Tuple[Any, int]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path,
        jax.tree.map(lambda x: x, {"state": template, "epoch": 0}),
    )
    return restored["state"], int(restored["epoch"])

"""Optimizer + LR schedule + EMA, optax-based.

Reference semantics:
  * AdamW lr 1e-4, betas (0.9, 0.999), wd 1e-4, with a regex param group giving
    the backbone a different lr (src/misc/get_param_dicts.py:8-40, configs).
  * MultiStepLR (milestones, gamma) + optional per-step LinearWarmup
    (src/nn/optimizer/warmup.py).
  * ModelEMA with exponential warmup ramp decay*(1-exp(-updates/warmups))
    (src/nn/optimizer/ema.py:20-67).
  * Global-norm gradient clipping (engine.py:82-85, clip_max_norm 0.1).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float,
                       warmup_steps: int = 0):
    """MultiStepLR over *epoch-boundary* steps, with optional linear warmup.

    `milestones` are given in optimizer steps (the trainer converts epochs).
    """
    def schedule(step):
        lr = base_lr
        factor = jnp.ones((), jnp.float32)
        for m in milestones:
            factor = factor * jnp.where(step >= m, gamma, 1.0)
        lr = base_lr * factor
        if warmup_steps > 0:
            w = jnp.clip(step / warmup_steps, 0.0, 1.0)
            lr = lr * w
        return lr

    return schedule


def resolve_backbone_freeze(backbone_name: str, freeze_at: int = -1,
                            freeze_stem_only: bool = True,
                            freeze_backbone: bool = False):
    """Backbone-family freeze defaults.

    The reference ResNet unconditionally freezes conv1/bn1/layer1 — everything
    not in layer2/3/4 (resnet.py:64-66) — even with train_backbone=True; map
    that onto (freeze_at=0, freeze_stem_only=False) when no explicit freeze_at
    was requested. HGNetv2 trains everything by default
    (include/detrpose_hgnetv2.py:34-35)."""
    if (backbone_name.startswith("resnet") and freeze_at < 0
            and not freeze_backbone):
        return 0, False
    return freeze_at, freeze_stem_only


def make_optimizer(
    params: Any,
    base_lr: float = 1e-4,
    backbone_lr: float = 1e-5,
    betas=(0.9, 0.999),
    weight_decay: float = 1e-4,
    clip_max_norm: float = 0.1,
    milestones: Sequence[int] = (),
    gamma: float = 0.1,
    warmup_steps: int = 0,
    grad_accum_steps: int = 1,
    freeze_backbone_norm: bool = True,
    freeze_at: int = -1,
    freeze_stem_only: bool = True,
    freeze_backbone: bool = False,
) -> optax.GradientTransformation:
    """AdamW with a backbone lr multiplier, clipping, MultiStep schedule, and
    optional gradient accumulation (reference: engine.py:43-60 sequential
    micro-batches -> optax.MultiSteps).

    Freeze knobs mirror the reference backbone's requires_grad surgery
    (hgnetv2.py:526-533, 566-569) as optimizer masks: ``freeze_at >= 0``
    freezes the stem and, unless ``freeze_stem_only``, stages 0..freeze_at;
    ``freeze_backbone`` freezes the whole backbone (freeze_network). All are
    no-ops in the shipped reference configs (include/detrpose_hgnetv2.py:34-35).
    """
    sched_main = multistep_schedule(base_lr, milestones, gamma, warmup_steps)
    sched_bb = multistep_schedule(backbone_lr, milestones, gamma, warmup_steps)

    def _stage_index(key: str):
        """Backbone sub-module -> stem (-1) / stage index, across both
        backbone families: HGNetv2 names `stem` + `stages_{i}`
        (models/hgnetv2.py), ResNet names `conv1`/`bn1` (stem) +
        `layer{i+1}_{block}` (models/resnet.py)."""
        if key in ("stem", "conv1", "bn1"):
            return -1
        try:
            if key.startswith("stages_"):
                return int(key.split("_")[1])
            if key.startswith("layer"):
                return int(key[len("layer"):].split("_")[0]) - 1
        except ValueError:
            # inner module names that merely look stage-like (HGNetv2's
            # `layers_{i}` blocks reach here if no outer key matched first)
            return None
        return None

    def _is_bn(key: str) -> bool:
        # HGNetv2 BN modules are named exactly "bn"; ResNet uses bn1/bn2/bn3
        # and downsample_bn.
        return key == "bn" or key.startswith("bn") or key.endswith("_bn")

    def label_fn(tree):
        def label(path, _):
            keys = [getattr(p, "key", "") for p in path]
            if keys and keys[0] == "backbone":
                if freeze_backbone:
                    return "frozen"
                if freeze_at >= 0:
                    stage = next((s for k in keys[1:]
                                  if (s := _stage_index(k)) is not None), None)
                    if stage == -1:
                        return "frozen"
                    if not freeze_stem_only and stage is not None \
                            and stage <= freeze_at:
                        return "frozen"
                # FrozenBatchNorm semantics (reference hgnetv2.py:24-60 and
                # resnet.py FrozenBatchNorm2d, freeze_norm=True in all shipped
                # configs): BN affine params in the backbone get no updates.
                if freeze_backbone_norm and any(_is_bn(k) for k in keys):
                    return "frozen"
                return "backbone"
            return "main"

        return jax.tree_util.tree_map_with_path(label, tree)

    def adamw(sched):
        return optax.adamw(sched, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay)

    tx = optax.multi_transform(
        {"main": adamw(sched_main), "backbone": adamw(sched_bb),
         "frozen": optax.set_to_zero()},
        label_fn(params),
    )
    k = max(int(grad_accum_steps), 1)
    pre = []
    if k > 1:
        # Reference semantics (engine.py:43-85): micro-batch losses are NOT
        # divided by k, so backward() accumulates the SUM of micro gradients,
        # and clip_grad_norm_ clips that sum. optax.MultiSteps accumulates the
        # MEAN; rescale by k before clipping so the clipped quantity (and how
        # often the 0.1 threshold engages) matches the reference exactly.
        pre.append(optax.scale(float(k)))
    if clip_max_norm and clip_max_norm > 0:
        pre.append(optax.clip_by_global_norm(clip_max_norm))
    if pre:
        tx = optax.chain(*pre, tx)
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx


class EMA:
    """Functional EMA state helpers (reference: src/nn/optimizer/ema.py).

    The reference EMAs every floating entry of the full state_dict — BN
    running stats included (ema.py:55-67 iterates state_dict(), not just
    parameters) — so the EMA state here carries both params and batch_stats.
    """

    @staticmethod
    def init(params, batch_stats=None):
        # Copy (not alias) so state.params and state.ema.params are distinct
        # buffers — donation of the TrainState would otherwise see the same
        # buffer twice.
        copy = lambda t: jax.tree.map(lambda p: jnp.array(p, copy=True), t)
        return {"params": copy(params),
                "batch_stats": copy(batch_stats if batch_stats is not None else {}),
                "updates": jnp.zeros((), jnp.int32)}

    @staticmethod
    def update(ema_state, params, decay: float = 0.9999, warmups: int = 2000,
               batch_stats=None):
        updates = ema_state["updates"] + 1
        d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / warmups))
        blend = lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d)
        new = jax.tree.map(blend, ema_state["params"], params)
        out = {"params": new, "updates": updates}
        if batch_stats is not None and "batch_stats" in ema_state:
            out["batch_stats"] = jax.tree.map(
                blend, ema_state["batch_stats"], batch_stats)
        else:
            out["batch_stats"] = ema_state.get("batch_stats", {})
        return out

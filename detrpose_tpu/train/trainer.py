"""Trainer: full training/eval lifecycle on a TPU mesh.

Reference semantics: src/solver/trainer.py (fit epoch loop :172-309, eval
:311-341, resume :343-379) and src/solver/engine.py (train_one_epoch :15-117,
evaluate :120-176). TPU-native mapping:
  * DDP + per-rank batch split -> pjit over a 1-D 'data' mesh, global batch.
  * AMP autocast/GradScaler     -> bf16 module dtype, fp32 params (no scaler).
  * SyncBN                      -> global BN stats under pjit.
  * checkpoint.pth              -> orbax checkpoint of the TrainState.
  * loss-NaN hard exit          -> same guard (engine.py:68-71).
"""
from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel import (
    TrainState, batch_sharding, init_train_state, make_mesh, make_train_step,
    replicated_sharding,
)
from ..models import postprocess
from ..train.optim import make_optimizer
from ..data.evaluator import KeypointEvaluator
from ..utils.checkpoint import save_checkpoint, restore_checkpoint


class Trainer:
    def __init__(
        self,
        model,
        model_cfg,
        train_loader=None,
        val_loader=None,
        val_gts: Optional[Dict] = None,
        output_dir: str = "output",
        epochs: int = 52,
        lr: float = 1e-4,
        backbone_lr: float = 1e-5,
        weight_decay: float = 1e-4,
        clip_max_norm: float = 0.1,
        milestones=(1000,),
        gamma: float = 0.1,
        warmup_steps: int = 0,
        grad_accum_steps: int = 1,
        use_ema: bool = True,
        ema_decay: float = 0.9999,
        ema_warmups: int = 2000,
        matcher_backend: str = "auction",
        weight_dict=None,
        save_interval: int = 1,
        n_devices: Optional[int] = None,
        log_fn=print,
        tensorboard: bool = True,
        eval_use_area: bool = True,
        crowd_index: Optional[Dict] = None,
    ):
        self.model = model
        self.cfg = model_cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.val_gts = val_gts
        self.eval_use_area = eval_use_area
        self.crowd_index = crowd_index
        self.output_dir = output_dir
        self.epochs = epochs
        self.use_ema = use_ema
        self.save_interval = save_interval
        self.log = log_fn

        os.makedirs(output_dir, exist_ok=True)
        self.mesh = make_mesh(n_devices)
        self.shard_b = batch_sharding(self.mesh)
        self.repl = replicated_sharding(self.mesh)

        # Milestones are epochs in the config; convert to *optimizer* steps
        # (with grad accumulation, the loader yields micro-batches and the
        # optimizer steps once per grad_accum_steps of them).
        self.grad_accum_steps = max(int(grad_accum_steps), 1)
        micro_per_epoch = len(train_loader) if train_loader is not None else 1
        opt_steps_per_epoch = max(micro_per_epoch // self.grad_accum_steps, 1)
        params_shape = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 3)), train=True)
        )["params"]
        self._opt_milestones = [m * opt_steps_per_epoch for m in milestones]
        self._lr_args = (lr, backbone_lr, gamma, warmup_steps)
        self.tx = make_optimizer(
            params_shape, lr, backbone_lr, weight_decay=weight_decay,
            clip_max_norm=clip_max_norm,
            milestones=self._opt_milestones, gamma=gamma,
            warmup_steps=warmup_steps,
            grad_accum_steps=self.grad_accum_steps,
        )
        self.state = init_train_state(
            self.model, self.tx, jax.random.PRNGKey(0),
            jnp.zeros((1, 128, 128, 3)), use_ema=use_ema)
        self.state = jax.device_put(self.state, self.repl)

        self._step = make_train_step(
            model, self.tx, num_body_points=model_cfg.num_body_points,
            num_classes=model_cfg.num_classes, weight_dict=weight_dict,
            matcher_backend=matcher_backend,
            ema_decay=ema_decay, ema_warmups=ema_warmups, use_ema=use_ema,
            grad_accum_steps=self.grad_accum_steps,
        )
        self._jit_step = jax.jit(self._step)  # NOTE: donation is pathological on the axon runtime (100x slower)
        self._jit_eval = jax.jit(
            lambda v, img, ts: postprocess(
                model.apply(v, img, train=False), ts,
                num_body_points=model_cfg.num_body_points),
        )
        self.start_epoch = 0
        self.best_ap = -1.0
        # TensorBoard scalars (reference: trainer.py:130-134, engine.py:99-107).
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # noqa: F401

                self._tb = tf.summary.create_file_writer(
                    os.path.join(output_dir, "tb"))
            except Exception:
                self._tb = None

    def _tb_scalars(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        if self._tb is None:
            return
        import tensorflow as tf

        with self._tb.as_default():
            for k, v in scalars.items():
                tf.summary.scalar(prefix + k, float(v), step=step)

    # ----------------------------------------------------------------- train
    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        def put_tree(tree, sharding):
            return jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), sharding), tree)

        out = {
            "images": put_tree(batch["images"], self.shard_b),
            "targets": put_tree(batch["targets"], self.shard_b),
        }
        if "dn" in batch:
            dn = batch["dn"]
            out["dn"] = {
                "labels": jax.device_put(jnp.asarray(dn["labels"]), self.shard_b),
                "pose_logits": jax.device_put(jnp.asarray(dn["pose_logits"]), self.shard_b),
                "attn_mask": jax.device_put(jnp.asarray(dn["attn_mask"]), self.repl),
                "dn_match": {
                    "query_idx": jax.device_put(jnp.asarray(dn["dn_match"]["query_idx"]), self.shard_b),
                    "gt_idx": jax.device_put(jnp.asarray(dn["dn_match"]["gt_idx"]), self.shard_b),
                    "valid": jax.device_put(jnp.asarray(dn["dn_match"]["valid"]), self.shard_b),
                    "num_group": jax.device_put(jnp.asarray(dn["dn_match"]["num_group"]), self.repl),
                    "active_mask": jax.device_put(
                        jnp.asarray(dn["dn_match"]["active_mask"]), self.repl),
                },
            }
        return out

    def train_one_epoch(self, epoch: int, print_freq: int = 50,
                        nan_check_freq: int = 10) -> Dict[str, float]:
        from ..utils.meters import MetricLogger

        self.train_loader.set_epoch(epoch)
        n = 0
        agg: Dict[str, float] = {}
        logger = MetricLogger()
        total_steps = len(self.train_loader)
        with self.mesh:
            for batch in logger.log_every(
                    self.train_loader, print_freq,
                    header=f"Epoch: [{epoch}]", total=total_steps,
                    log_fn=self.log):
                db = self._device_batch(batch)
                self.state, metrics = self._jit_step(self.state, db)
                n += 1
                # accumulate on device (async) so the host loader overlaps with
                # TPU compute; sync only at the NaN-check cadence. The step
                # itself already *skips* non-finite updates on device
                # (train_step.py), so nothing is poisoned before we notice.
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + v
                if n % nan_check_freq == 0 or n == 1 or n == total_steps:
                    total = float(metrics["loss_total"])
                    if not math.isfinite(total):
                        raise RuntimeError(
                            f"Loss is {total}, stopping training (engine.py:68-71)")
                    logger.update(loss=total)
        return {k: float(v) / max(n, 1) for k, v in agg.items()}

    # ------------------------------------------------------------------ eval
    def evaluate(self, use_ema: Optional[bool] = None) -> Dict[str, float]:
        if self.val_loader is None or self.val_gts is None:
            return {}
        use_ema = self.use_ema if use_ema is None else use_ema
        params = (self.state.ema["params"]
                  if (use_ema and self.state.ema is not None) else self.state.params)
        variables = {"params": params, "batch_stats": self.state.batch_stats}
        ev = KeypointEvaluator(self.val_gts, self.cfg.num_body_points,
                               use_area=self.eval_use_area,
                               crowd_index=self.crowd_index)
        n_dev = len(self.mesh.devices.reshape(-1))
        with self.mesh:
            for batch in self.val_loader:
                imgs = batch["images"]
                sizes = batch["orig_sizes"]
                n_real = imgs.shape[0]
                # pad the last partial batch so it shards evenly over the mesh
                if n_real % n_dev:
                    padn = n_dev - (n_real % n_dev)
                    imgs = np.concatenate([imgs, np.repeat(imgs[-1:], padn, 0)])
                    sizes = np.concatenate([sizes, np.repeat(sizes[-1:], padn, 0)])
                img = jax.device_put(jnp.asarray(imgs), self.shard_b)
                ts = jax.device_put(jnp.asarray(sizes), self.shard_b)
                scores, labels, kpts = self._jit_eval(variables, img, ts)
                scores, kpts = np.asarray(scores), np.asarray(kpts)
                for b, img_id in enumerate(batch["image_ids"][:n_real]):
                    ev.update(int(img_id), scores[b], kpts[b])
        # multi-host: merge per-process fragments, then accumulate on every
        # rank (reference coco_eval.synchronize_between_processes, :93-105)
        from ..parallel.dist import is_main_process, merge_detections

        ev.dets = merge_detections(ev.dets)
        ev.accumulate()
        stats = ev.summarize()
        self.log("eval: " + json.dumps({k: round(v, 4) for k, v in stats.items()}))
        # per-epoch eval dump (reference trainer.py:296-304 saves the COCOeval
        # state as eval/latest.pth): precision/recall tables + stats as npz
        if is_main_process():
            try:
                eval_dir = os.path.join(self.output_dir, "eval")
                os.makedirs(eval_dir, exist_ok=True)
                np.savez(os.path.join(eval_dir, "latest.npz"),
                         precision=ev.precision, recall=ev.recall,
                         **{k: np.float64(v) for k, v in stats.items()})
            except Exception:
                pass
        return stats

    # ------------------------------------------------------------------ test
    def test(self, out_path: Optional[str] = None, use_ema: Optional[bool] = None,
             score_thresh: float = 0.0) -> str:
        """Run inference over val_loader and write a COCO results.json
        (test-dev submission format; reference: trainer.py:324-341)."""
        assert self.val_loader is not None
        use_ema = self.use_ema if use_ema is None else use_ema
        params = (self.state.ema["params"]
                  if (use_ema and self.state.ema is not None) else self.state.params)
        variables = {"params": params, "batch_stats": self.state.batch_stats}
        results = []
        n_dev = len(self.mesh.devices.reshape(-1))
        with self.mesh:
            for batch in self.val_loader:
                imgs = batch["images"]
                sizes = batch["orig_sizes"]
                n_real = imgs.shape[0]
                if n_real % n_dev:
                    padn = n_dev - (n_real % n_dev)
                    imgs = np.concatenate([imgs, np.repeat(imgs[-1:], padn, 0)])
                    sizes = np.concatenate([sizes, np.repeat(sizes[-1:], padn, 0)])
                scores, labels, kpts = self._jit_eval(
                    variables,
                    jax.device_put(jnp.asarray(imgs), self.shard_b),
                    jax.device_put(jnp.asarray(sizes), self.shard_b))
                scores = np.asarray(scores, np.float32)
                kpts = np.asarray(kpts, np.float32)
                for b, img_id in enumerate(batch["image_ids"][:n_real]):
                    for s, k in zip(scores[b], kpts[b]):
                        if s < score_thresh:
                            continue
                        results.append({
                            "image_id": int(img_id),
                            "category_id": 1,
                            "keypoints": [round(float(v), 2)
                                          for v in k.reshape(-1)],
                            "score": float(s),
                        })
        # multi-host: gather all ranks' results; rank 0 writes (reference
        # save_on_master, dist_utils.py:38)
        from ..parallel.dist import gather_lists, is_main_process

        results = gather_lists(results)
        out_path = out_path or os.path.join(self.output_dir, "results.json")
        if is_main_process():
            with open(out_path, "w") as f:
                json.dump(results, f)
            self.log(f"wrote {len(results)} detections to {out_path}")
        return out_path

    # ------------------------------------------------------------------- fit
    def fit(self):
        from ..parallel.dist import is_main_process

        log_path = os.path.join(self.output_dir, "log.txt")
        for epoch in range(self.start_epoch, self.epochs):
            train_stats = self.train_one_epoch(epoch)
            # current LRs per param group (reference logs them to TB,
            # trainer.py:252-256); pure function of the optimizer step
            from .optim import multistep_schedule

            base_lr, backbone_lr, gamma, warmup_steps = self._lr_args
            opt_step = int(self.state.step) // self.grad_accum_steps
            train_stats["lr"] = float(multistep_schedule(
                base_lr, self._opt_milestones, gamma, warmup_steps)(opt_step))
            train_stats["lr_backbone"] = float(multistep_schedule(
                backbone_lr, self._opt_milestones, gamma, warmup_steps)(opt_step))
            stats = self.evaluate()
            ap = stats.get("AP", -1.0)
            # multi-host: checkpoints/TB/log.txt written by rank 0 only
            # (reference save_on_master, dist_utils.py:38; params are
            # replicated so every rank holds the same state)
            if is_main_process():
                self._tb_scalars(epoch, train_stats, "train/")
                self._tb_scalars(epoch, stats, "eval/")
                if epoch % self.save_interval == 0 or ap > self.best_ap:
                    save_checkpoint(os.path.join(self.output_dir, "checkpoint"),
                                    self.state, epoch)
                if ap > self.best_ap:
                    save_checkpoint(os.path.join(self.output_dir, "best"),
                                    self.state, epoch)
                with open(log_path, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch,
                        **{f"train_{k}": v for k, v in train_stats.items()},
                        **stats,
                    }) + "\n")
            if ap > self.best_ap:
                self.best_ap = ap
        return self.best_ap

    # ---------------------------------------------------------------- resume
    def resume(self, path: str):
        self.state, epoch = restore_checkpoint(path, self.state)
        self.start_epoch = epoch + 1
        self.log(f"resumed from {path} at epoch {epoch}")

    def load_torch_weights(self, pth_path: str, prefer_ema: bool = True):
        """Load a reference zoo .pth (converted) into params + EMA.

        The round-trip acceptance path for COCO AP parity: convert a reference
        checkpoint, then `evaluate()`.
        """
        from ..utils.convert import convert_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(pth_path, prefer_ema=prefer_ema)
        template = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 128, 128, 3)), train=True))
        variables = convert_state_dict(sd, dict(template))
        params = jax.tree.map(jnp.asarray, variables["params"])
        stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
        new_ema = (dict(self.state.ema, params=jax.tree.map(jnp.array, params))
                   if self.state.ema is not None else None)
        self.state = self.state.replace(params=params, batch_stats=stats,
                                        ema=new_ema)
        self.state = jax.device_put(self.state, self.repl)
        self.log(f"loaded torch weights from {pth_path}")

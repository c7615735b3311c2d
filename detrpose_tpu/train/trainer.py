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

import contextlib
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
from ..train.optim import make_optimizer, resolve_backbone_freeze
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
        losses=("vfl", "keypoints"),
        save_interval: int = 1,
        n_devices: Optional[int] = None,
        log_fn=print,
        tensorboard: bool = True,
        eval_use_area: bool = True,
        crowd_index: Optional[Dict] = None,
        freeze_at: int = -1,
        freeze_stem_only: bool = True,
        freeze_backbone: bool = False,
        stage_uint8: Optional[bool] = None,
        eval_stage_uint8: bool = False,
        track_regular_best: bool = True,
        prewarm_scales: bool = True,
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
        # ResNet parity: the reference unconditionally freezes conv1/bn1/layer1
        # (resnet.py:64-66); explicit freeze_at settings still win.
        freeze_at, freeze_stem_only = resolve_backbone_freeze(
            getattr(model_cfg, "backbone_name", ""), freeze_at,
            freeze_stem_only, freeze_backbone)

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
            freeze_at=freeze_at, freeze_stem_only=freeze_stem_only,
            freeze_backbone=freeze_backbone,
        )
        self.state = init_train_state(
            self.model, self.tx, jax.random.PRNGKey(0),
            jnp.zeros((1, 128, 128, 3)), use_ema=use_ema)
        self._single = int(np.prod(self.mesh.devices.shape)) == 1
        if not self._single:
            self.state = jax.device_put(self.state, self.repl)

        self._step = make_train_step(
            model, self.tx, num_body_points=model_cfg.num_body_points,
            num_classes=model_cfg.num_classes, weight_dict=weight_dict,
            losses=tuple(losses), matcher_backend=matcher_backend,
            ema_decay=ema_decay, ema_warmups=ema_warmups, use_ema=use_ema,
            grad_accum_steps=self.grad_accum_steps,
        )
        # Staging/jit strategy is device-count dependent:
        #  * single device: PLAIN jax.jit, host numpy args. The transfer
        #    happens at call time on the host thread while the previous step
        #    still executes asynchronously on device, so H2D overlaps compute
        #    for free. Explicit shardings are avoided entirely — jitting with
        #    in_shardings under a 1-device mesh drives this runtime into a
        #    pathological mode (measured 12.9 s/step vs 16 ms for the same
        #    program under plain jit, and it degrades every later executable
        #    in the process).
        #  * multi device: in_shardings jit fed host numpy (placement inside
        #    the compiled call) — per-leaf device_put costs ~27 ms dispatch
        #    each on this runtime (see __graft_entry__.dryrun_multichip).
        # NOTE: donation is pathological on the axon runtime (100x slower).
        self._jit_steps: Dict[bool, Any] = {}
        # bf16 models: ship images as uint8 (pixels*255) and dequantize on
        # device, cutting the dominant H2D bytes 4x vs f32. This quantizes
        # augmented/resized float pixels to 1/255 steps — at 1.0 that matches
        # the bf16 input ulp (2^-8), but for dark pixels (<0.25) the bf16 ulp
        # is finer, so up to ~2 bits of input precision are traded for
        # transfer bandwidth. Opt out with stage_uint8=False (f32 staging)
        # when exact float inputs matter more than H2D cost.
        self._img_u8 = (model_cfg.dtype == jnp.bfloat16
                        if stage_uint8 is None else bool(stage_uint8))
        # Eval/test stage in float by default regardless of stage_uint8: the
        # AP-parity protocol was established on exact float inputs, and a
        # silent 1/255 quantization of val pixels could drift reported AP.
        # Opt in (eval_stage_uint8=True) when H2D bandwidth dominates eval.
        self._img_u8_eval = bool(eval_stage_uint8)
        self.track_regular_best = track_regular_best
        self.prewarm_scales = prewarm_scales
        # (image shape, dn?) programs already timed-around (see
        # train_one_epoch's steady-state accounting)
        self._seen_programs: set = set()
        # the eager metric stack/accum jits compile on their first two uses
        # of the process; once warm, later epochs measure with no per-epoch
        # step exclusions (advisor r4)
        self._accum_warm = False
        self._model_dtype = model_cfg.dtype

        def eval_fn(v, img, ts):
            if img.dtype == jnp.uint8:
                img = img.astype(self._model_dtype) / 255.0
            return postprocess(model.apply(v, img, train=False), ts,
                               num_body_points=model_cfg.num_body_points)

        self._jit_eval = (jax.jit(eval_fn) if self._single else jax.jit(
            eval_fn, in_shardings=(self.repl, self.shard_b, self.shard_b)))
        # Metric accumulation across steps runs as ONE jitted call per step:
        # eager ops are not only slow to dispatch on this runtime (~1.7 ms
        # each) but drain ~1000x slower than jitted executions once queued.
        self._jit_stack = jax.jit(lambda m: jnp.stack(list(m.values())))
        self._jit_accum = jax.jit(lambda a, m: a + jnp.stack(list(m.values())))
        self.start_epoch = 0
        self.best_ap = -1.0
        # dual best tracking (reference src/misc/metrics.py:12-84): regular
        # and EMA weights evaluated separately each epoch, two best
        # checkpoints (best_regular / best_ema) plus the overall "best".
        from ..utils.meters import BestMetricHolder

        self.best_holder = BestMetricHolder(use_ema=use_ema)
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

    def _mesh_ctx(self):
        """Active-mesh context for jit dispatch. On a single device this is a
        no-op: executing jit under an active Mesh compiles through the SPMD
        partitioner, which this runtime slow-paths ~100x (see __init__)."""
        return contextlib.nullcontext() if self._single else self.mesh

    # ----------------------------------------------------------------- train
    # dn leaves that are identical across the batch (not batch-sharded)
    _REPL_LEAVES = ("attn_mask", "num_group", "active_mask")

    def _stage_images(self, images, for_eval: bool = False) -> np.ndarray:
        """Host-side image staging: bf16 models ship uint8 (4x fewer H2D
        bytes, dequantized on device — see __init__), f32 models ship f32.
        Eval stages float unless eval_stage_uint8 opts in (see __init__)."""
        img = np.asarray(images, np.float32)
        if self._img_u8_eval if for_eval else self._img_u8:
            return np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
        return img

    def _host_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Select the step's input leaves as host numpy arrays; placement
        happens inside the jitted call (plain jit on one device, in_shardings
        on a real mesh — see __init__ for why)."""
        out = {
            "images": self._stage_images(batch["images"]),
            "targets": jax.tree.map(np.asarray, batch["targets"]),
        }
        if "dn" in batch:
            dn = batch["dn"]
            out["dn"] = {
                "labels": np.asarray(dn["labels"]),
                "slot_used": np.asarray(dn["slot_used"]),
                "pose_logits": np.asarray(dn["pose_logits"]),
                "attn_mask": np.asarray(dn["attn_mask"]),
                "dn_match": jax.tree.map(np.asarray, dict(dn["dn_match"])),
            }
        return out

    def _wrapped_step(self, state, batch):
        if batch["images"].dtype == jnp.uint8:
            batch = dict(batch)
            batch["images"] = batch["images"].astype(self._model_dtype) / 255.0
        return self._step(state, batch)

    def _jit_step(self, batch: Dict[str, Any]):
        """jit of the train step. Single device: one plain jax.jit (its own
        cache handles the with/without-dn structures). Real mesh: in_shardings
        matching this batch's structure, cached per structure."""
        key = "dn" in batch
        if key not in self._jit_steps:
            if self._single:
                jitted = (self._jit_steps[not key]
                          if (not key) in self._jit_steps
                          else jax.jit(self._wrapped_step))
            else:
                def choose(path, _):
                    leaf = (path[-1].key if hasattr(path[-1], "key")
                            else str(path[-1]))
                    return self.repl if leaf in self._REPL_LEAVES else self.shard_b

                spec = jax.tree_util.tree_map_with_path(choose, batch)
                jitted = jax.jit(self._wrapped_step,
                                 in_shardings=(self.repl, spec))
            self._jit_steps[key] = jitted
        return self._jit_steps[key]

    def train_one_epoch(self, epoch: int, print_freq: int = 50,
                        nan_check_freq: int = 10) -> Dict[str, float]:
        from ..utils.meters import MetricLogger

        self.train_loader.set_epoch(epoch)
        n = 0
        # Accumulators keyed by metric structure: an epoch can mix dn and
        # no-dn batches (build_cdn returns None for a batch with zero valid
        # GT), whose metric dicts carry different key sets — one stacked
        # vector per structure, merged per-key at epoch end.
        accs: Dict[tuple, Any] = {}
        acc_n: Dict[tuple, int] = {}
        logger = MetricLogger()
        total_steps = len(self.train_loader)
        t_loop0 = time.perf_counter()
        # Steady-state step timing must exclude EVERY compile, not just the
        # step-1/2 first-use ones: the multi-scale collate draws ~10 scales
        # (data/loader.py generate_scales) and each unseen (image shape, dn?)
        # pair is a new XLA program that can land mid-epoch. Sum time only
        # over segments whose program was already compiled (round-3 weak #5).
        # The seen set persists across epochs (compiles are per-process), and
        # the first-two-steps exclusion (the eager metric stack/accum jits
        # compiling on first use) applies only until those jits are warm —
        # epoch 2+ of a multi-scale run then measures with zero exclusions.
        seen_programs = self._seen_programs
        steady_t = 0.0
        steady_n = 0
        # Open a segment immediately: an epoch whose every program is already
        # compiled (epoch 2+, or fully prewarmed) has no fresh step to open
        # one. A segment closed with zero steady steps contributes no time.
        seg_t0: Optional[float] = time.perf_counter()
        seg_n = 0
        with self._mesh_ctx():
            for batch in logger.log_every(
                    self.train_loader, print_freq,
                    header=f"Epoch: [{epoch}]", total=total_steps,
                    log_fn=self.log):
                db = self._host_batch(batch)
                program = (np.asarray(db["images"]).shape, "dn" in db)
                fresh = (program not in seen_programs
                         or (not self._accum_warm and n < 2))
                seen_programs.add(program)
                if fresh and seg_t0 is not None:
                    # close the running steady segment before the compile
                    # step; block-drain first so the segment's queued async
                    # steps are charged to the segment, not to the (excluded)
                    # compile step. A segment with zero steady steps (e.g.
                    # the one opened at loop start when step 0 is fresh)
                    # contributes nothing.
                    if seg_n > 0:
                        jax.block_until_ready(list(accs.values()))
                        steady_t += time.perf_counter() - seg_t0
                        steady_n += seg_n
                    seg_t0, seg_n = None, 0
                self.state, metrics = self._jit_step(db)(self.state, db)
                n += 1
                # accumulate on device (async) so the host loader overlaps with
                # TPU compute; ONE stacked vector per step — per-term eager adds
                # cost ~1.7 ms dispatch each on this runtime, and their 46
                # first-use eager compiles cost minutes. Sync only at the
                # NaN-check cadence; the step itself already *skips* non-finite
                # updates on device (train_step.py).
                mk = tuple(metrics)
                accs[mk] = (self._jit_accum(accs[mk], metrics) if mk in accs
                            else self._jit_stack(metrics))
                acc_n[mk] = acc_n.get(mk, 0) + 1
                # The first check happens at the cadence, not at step 1: on
                # the axon runtime the FIRST device->host value read of the
                # process permanently degrades execution ~100x (measured
                # 15 ms/step -> 1.72 s/step for the same executable, any read
                # path), so the loop defers reads as long as correctness
                # allows. The step itself already *skips* non-finite updates
                # on device (train_step.py), so nothing is poisoned before the
                # host notices. Real TPU hosts read in microseconds; there a
                # per-step check would also be fine.
                if nan_check_freq and (n % nan_check_freq == 0
                                       or n == total_steps):
                    jax.block_until_ready(metrics)  # block-drain, THEN read
                    total = float(metrics["loss_total"])
                    if not math.isfinite(total):
                        raise RuntimeError(
                            f"Loss is {total}, stopping training (engine.py:68-71)")
                    logger.update(loss=total)
                if fresh:
                    # a compile just happened (new program, or the n<=2
                    # eager stack/add first-use): drain it, then open a new
                    # steady segment
                    jax.block_until_ready(accs[mk])
                    seg_t0 = time.perf_counter()
                    seg_n = 0
                else:
                    seg_n += 1
        # Drain the queue with block_until_ready BEFORE the value read: on
        # axon a fetch that drains queued work runs ~20x slower than the work
        # itself (measured 7.5 s/step vs ~0.4 s/step), while a block-drain
        # runs at execution speed; the read then copies a ready buffer.
        out: Dict[str, float] = {}
        if accs:
            jax.block_until_ready(list(accs.values()))
            sums: Dict[str, float] = {}
            cnts: Dict[str, int] = {}
            for mk, acc in accs.items():
                for k, v in zip(mk, np.asarray(acc, np.float64).tolist()):
                    sums[k] = sums.get(k, 0.0) + v
                    cnts[k] = cnts.get(k, 0) + acc_n[mk]
            out = {k: sums[k] / cnts[k] for k in sums}
        # measured Trainer-LOOP step time (host batch prep + H2D transfer +
        # step), steady state excluding every compile step — comparable to
        # tools/benchmark.bench_train_step's pre-staged number
        if seg_t0 is not None and seg_n > 0:
            steady_t += time.perf_counter() - seg_t0
            steady_n += seg_n
        if steady_n > 0:
            out["step_ms"] = steady_t / steady_n * 1000.0
        out["steady_steps"] = float(steady_n)
        out["compile_programs"] = float(len(seen_programs))
        out["epoch_s"] = time.perf_counter() - t_loop0
        if n >= 2:
            self._accum_warm = True
        return out

    def _eval_variables(self, use_ema: bool) -> Dict[str, Any]:
        """Weights + BN stats for an eval pass. The EMA stream carries its own
        batch_stats (reference ModelEMA EMAs the full state_dict, ema.py:55-67,
        so its eval uses EMA'd running stats, not the live ones)."""
        if use_ema and self.state.ema is not None:
            stats = self.state.ema.get("batch_stats") or self.state.batch_stats
            return {"params": self.state.ema["params"], "batch_stats": stats}
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats}

    # ------------------------------------------------------------------ eval
    def evaluate(self, use_ema: Optional[bool] = None) -> Dict[str, float]:
        if self.val_loader is None or self.val_gts is None:
            return {}
        use_ema = self.use_ema if use_ema is None else use_ema
        variables = self._eval_variables(use_ema)
        ev = KeypointEvaluator(self.val_gts, self.cfg.num_body_points,
                               use_area=self.eval_use_area,
                               crowd_index=self.crowd_index)
        n_dev = len(self.mesh.devices.reshape(-1))
        with self._mesh_ctx():
            for batch in self.val_loader:
                imgs = batch["images"]
                sizes = batch["orig_sizes"]
                n_real = imgs.shape[0]
                # pad the last partial batch so it shards evenly over the mesh
                if n_real % n_dev:
                    padn = n_dev - (n_real % n_dev)
                    imgs = np.concatenate([imgs, np.repeat(imgs[-1:], padn, 0)])
                    sizes = np.concatenate([sizes, np.repeat(sizes[-1:], padn, 0)])
                scores, labels, kpts = self._jit_eval(
                    variables, self._stage_images(imgs, for_eval=True),
                    np.asarray(sizes))
                jax.block_until_ready(scores)  # block-drain, THEN read
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
        variables = self._eval_variables(use_ema)
        results = []
        n_dev = len(self.mesh.devices.reshape(-1))
        with self._mesh_ctx():
            for batch in self.val_loader:
                imgs = batch["images"]
                sizes = batch["orig_sizes"]
                n_real = imgs.shape[0]
                if n_real % n_dev:
                    padn = n_dev - (n_real % n_dev)
                    imgs = np.concatenate([imgs, np.repeat(imgs[-1:], padn, 0)])
                    sizes = np.concatenate([sizes, np.repeat(sizes[-1:], padn, 0)])
                scores, labels, kpts = self._jit_eval(
                    variables, self._stage_images(imgs, for_eval=True),
                    np.asarray(sizes))
                jax.block_until_ready(scores)  # block-drain, THEN read
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

        # dedup wrap-padded shard overlap by image id (first rank wins)
        results = gather_lists(results, dedup_key=lambda r: r["image_id"])
        out_path = out_path or os.path.join(self.output_dir, "results.json")
        if is_main_process():
            with open(out_path, "w") as f:
                json.dump(results, f)
            self.log(f"wrote {len(results)} detections to {out_path}")
        return out_path

    # -------------------------------------------------------------- prewarm
    def prewarm_multiscale(self, max_scales: Optional[int] = None) -> int:
        """Compile the train step for every multi-scale collate bucket up
        front, so no mid-epoch compile ever stalls training.

        The reference recipe draws a random scale per batch until stop_epoch
        (dataloader.py:97-106); on TPU each distinct scale is a separate XLA
        program (~tens of seconds each to compile cold). This runs one step
        per scale on a zero-filled copy of a real batch — the returned state
        is discarded (the step is a pure function), only the jit dispatch
        cache and the persistent compilation cache are warmed.

        Returns the number of programs warmed. No-op without a multi-scale
        loader.
        """
        loader = self.train_loader
        inner = getattr(loader, "loader", loader)  # unwrap Prefetcher
        scales = getattr(inner, "scales", None)
        if not scales:
            return 0
        scales = sorted(set(scales))
        # A run that starts at/after the multi-scale stop epoch only ever
        # sees base_size batches — warming every bucket would pay ~tens of
        # seconds of compile per scale for programs that never run
        # (advisor r4).
        stop = getattr(inner, "multiscale_stop_epoch", None)
        if stop is not None and self.start_epoch >= stop:
            scales = [inner.base_size]
        if max_scales:
            scales = scales[:max_scales]
        # one real batch for its target/dn structure
        it = iter(loader)
        try:
            sample = next(it)
        except StopIteration:
            return 0
        finally:
            close = getattr(it, "close", None)
            if close:
                close()
        db0 = self._host_batch(sample)
        bs = db0["images"].shape[0]
        n = 0
        with self._mesh_ctx():
            for s in scales:
                db = dict(db0)
                db["images"] = np.zeros((bs, s, s, 3), db0["images"].dtype)
                _discard = self._jit_step(db)(self.state, db)
                # mark the program as compiled so train_one_epoch's steady
                # timer doesn't treat its first real occurrence as a compile
                # step and compile_programs reflects actual compiles
                self._seen_programs.add((db["images"].shape, "dn" in db))
                n += 1
            jax.block_until_ready(_discard)
        self.log(f"prewarmed {n} multi-scale train-step programs "
                 f"(scales {scales[0]}..{scales[-1]}, batch {bs})")
        return n

    # ------------------------------------------------------------------- fit
    def fit(self):
        from ..parallel.dist import is_main_process

        log_path = os.path.join(self.output_dir, "log.txt")
        if self.prewarm_scales:
            self.prewarm_multiscale()
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
            # evaluate EMA weights (the reference's per-epoch eval module,
            # trainer.py:240-250) AND, when EMA is on, the regular weights too
            # so both best streams are tracked (metrics.py:47-84).
            stats = self.evaluate()
            ap = stats.get("AP", -1.0)
            # The second (regular-weights) val pass doubles per-epoch eval
            # wall time; track_regular_best=False opts out and matches the
            # reference's single-stream per-epoch eval (trainer.py:240-250).
            stats_reg: Dict[str, float] = {}
            if (self.track_regular_best and self.use_ema
                    and self.state.ema is not None
                    and self.val_loader is not None):
                stats_reg = self.evaluate(use_ema=False)
            ap_reg = stats_reg.get("AP", -1.0)

            new_best_ema = self.best_holder.update_stream(ap, epoch, is_ema=True)
            new_best_reg = (self.best_holder.update_stream(ap_reg, epoch,
                                                           is_ema=False)
                            if stats_reg else False)
            # multi-host: checkpoints/TB/log.txt written by rank 0 only
            # (reference save_on_master, dist_utils.py:38; params are
            # replicated so every rank holds the same state)
            if is_main_process():
                self._tb_scalars(epoch, train_stats, "train/")
                self._tb_scalars(epoch, stats, "eval/")
                if stats_reg:
                    self._tb_scalars(epoch, stats_reg, "eval_regular/")
                if epoch % self.save_interval == 0 or ap > self.best_ap:
                    save_checkpoint(os.path.join(self.output_dir, "checkpoint"),
                                    self.state, epoch)
                if ap > self.best_ap:
                    save_checkpoint(os.path.join(self.output_dir, "best"),
                                    self.state, epoch)
                # dual best checkpoints (reference checkpoint_best_regular.pth,
                # trainer.py:268-280, extended with the EMA stream)
                if new_best_ema and self.use_ema:
                    save_checkpoint(os.path.join(self.output_dir, "best_ema"),
                                    self.state, epoch)
                if new_best_reg:
                    save_checkpoint(
                        os.path.join(self.output_dir, "best_regular"),
                        self.state, epoch)
                with open(log_path, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch,
                        **{f"train_{k}": v for k, v in train_stats.items()},
                        **stats,
                        **{f"regular_{k}": v for k, v in stats_reg.items()},
                        **self.best_holder.summary(),
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
        new_ema = (dict(self.state.ema,
                        params=jax.tree.map(jnp.array, params),
                        batch_stats=jax.tree.map(jnp.array, stats))
                   if self.state.ema is not None else None)
        self.state = self.state.replace(params=params, batch_stats=stats,
                                        ema=new_ema)
        # single device: leave placement to plain jit (explicit NamedSharding
        # placement on a 1-device mesh drives this runtime into the ~100x
        # SPMD slow path — see __init__'s staging notes)
        if not self._single:
            self.state = jax.device_put(self.state, self.repl)
        self.log(f"loaded torch weights from {pth_path}")

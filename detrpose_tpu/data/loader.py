"""Batch assembly: host-side loader turning dataset samples into device-ready
padded arrays (images NHWC float32 in [0,1], padded targets, optional CDN).

Replaces the reference's torch DataLoader + BatchImageCollateFunction
(src/data/dataloader.py): multi-scale collate is a per-batch random choice from
`generate_scales` until `stop_epoch` (dataloader.py:56-61, 97-106); each scale
is one jit cache entry on TPU.
"""
from __future__ import annotations

import multiprocessing
import random
from typing import Dict, Iterator, List, Optional

import numpy as np

from .coco import normalize_target, pad_targets
from ..train.cdn import CDNConfig, build_cdn


def generate_scales(base_size: int, base_size_repeat: int) -> List[int]:
    """Reference: src/data/dataloader.py:56-61 (±25% in steps of 32)."""
    scale_repeat = (base_size - int(base_size * 0.75 / 32) * 32) // 32
    scales = [int(base_size * 0.75 / 32) * 32 + i * 32 for i in range(scale_repeat)]
    scales += [base_size] * base_size_repeat
    scales += [int(base_size * 1.25 / 32) * 32 - i * 32 for i in range(scale_repeat)]
    return scales


# ---- worker-pool item loading ------------------------------------------
# The reference trains with DataLoader(num_workers=4)
# (configs/detrpose/include/dataset.py:48): JPEG decode + the augmentation
# policy (mosaic decodes 4 extra images) cannot keep a TPU fed from one
# Python thread. A per-epoch forkserver pool is created AFTER set_epoch so
# the pickled dataset carries the epoch-dependent policy state; each item
# re-seeds the transform RNG from (seed, epoch, index) so results are
# deterministic and independent of worker scheduling (torch similarly
# re-seeds per worker).
_WORKER_DS = None
_WORKER_CFG = None


def _worker_init(ds, num_keypoints, seed, epoch):
    global _WORKER_DS, _WORKER_CFG
    _WORKER_DS = ds
    _WORKER_CFG = (num_keypoints, seed, epoch)


def _load_item(idx):
    ds, (K, seed, epoch) = _WORKER_DS, _WORKER_CFG
    tf = getattr(ds, "transforms", None)
    if tf is not None and hasattr(tf, "rng"):
        # Mix with large odd constants so (epoch, idx) pairs never collide
        # for any realistic dataset size (a small epoch multiplier would make
        # epoch e item i replay epoch e+1 item i-mult's exact augmentation
        # stream on datasets larger than the multiplier, e.g. COCO's 118k).
        tf.rng = random.Random(
            seed * 0x9E3779B97F4A7C15 + epoch * 0x2545F4914F6CDD1D + idx)
    img, t = ds[idx]
    # Ship uint8 back through the pipe when the pipeline kept pixels uint8
    # (PIL path): 4x less IPC than float32; the parent dequantizes once per
    # batch. A float-producing pipeline is assumed to carry 0-255 pixel values
    # (the same contract as the in-process path, _iter_batches' else branch)
    # and is normalized to [0, 1] here.
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.asarray(img, np.float32) / 255.0
    h, w = arr.shape[:2]
    return arr, normalize_target(t, w, h, K)


class KeypointLoader:
    """Epoch-based loader; `num_workers` spins up a per-epoch worker pool for
    item decode+transform (0 = fully in-process, the exact legacy stream)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_keypoints: int = 17,
        train: bool = False,
        max_gt: int = 64,
        base_size: int = 640,
        base_size_repeat: Optional[int] = None,
        multiscale_stop_epoch: int = 48,
        with_cdn: bool = True,
        num_queries: int = 60,
        seed: int = 0,
        drop_last: bool = True,
        mixup_prob: float = 0.0,
        mixup_epochs=(4, 29),
        process_index: int = 0,
        process_count: int = 1,
        num_workers: int = 0,
    ):
        self.num_workers = num_workers
        self.worker_timeout = 300.0  # seconds per item fetch before erroring
        self.ds = dataset
        self.bs = batch_size
        self.K = num_keypoints
        self.train = train
        self.max_gt = max_gt
        self.base_size = base_size
        self.scales = (
            generate_scales(base_size, base_size_repeat)
            if (train and base_size_repeat) else None
        )
        self.multiscale_stop_epoch = multiscale_stop_epoch
        self.with_cdn = with_cdn and train
        self.num_queries = num_queries
        # CDN label flips are independent of the model's head classes — the
        # reference hard-codes num_classes=80 in prepare_for_cdn
        # (transformer.py:1271); CDNConfig carries the fidelity default.
        self.cdn_cfg = CDNConfig()
        self.seed = seed
        self.epoch = 0
        self.drop_last = drop_last
        self.mixup_prob = mixup_prob
        self.mixup_epochs = mixup_epochs
        # Multi-host: strided per-process shard of the (identically shuffled)
        # global order — DistributedSampler semantics (dist_utils.py:98-108).
        # batch_size is PER PROCESS (reference get_rank_batch_size splits the
        # total, src/solver/trainer.py:70-85).
        self.process_index = process_index
        self.process_count = max(process_count, 1)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.ds, "transforms") and hasattr(self.ds.transforms, "set_epoch"):
            self.ds.transforms.set_epoch(epoch)

    def _shard_len(self):
        n = len(self.ds)
        if self.process_count > 1:
            n = -(-n // self.process_count)  # ceil: wrap-padded shards
        return n

    def __len__(self):
        n = self._shard_len()
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = random.Random(self.seed + self.epoch)
        nprng = np.random.default_rng(
            self.seed + self.epoch + 7919 * self.process_index)
        order = list(range(len(self.ds)))
        if self.train:
            rng.shuffle(order)
        if self.process_count > 1:
            from ..parallel.dist import shard_indices

            order = shard_indices(order, self.process_index, self.process_count)

        pool = item_iter = None
        if self.num_workers > 0 and self.drop_last:
            # only feed whole batches to the pool (may leave order empty when
            # the shard is smaller than one batch — then no pool is spun up
            # and the epoch is simply empty)
            order = order[: (len(order) // self.bs) * self.bs]
        if self.num_workers > 0 and order:
            # forkserver, not fork: the parent is multithreaded by the time
            # an epoch starts (JAX/XLA runtime threads, the Prefetcher's
            # worker thread calls this __iter__), and fork() from a threaded
            # process can inherit a held malloc/logging/runtime lock and
            # deadlock the child. Workers fork from the clean forkserver
            # process instead; the dataset is pickled to each worker once per
            # epoch (same cost torch's spawn-context DataLoader pays).
            ctx = multiprocessing.get_context("forkserver")
            # The forkserver preloads __main__ by default, which re-executes
            # any driver script missing an `if __name__ == "__main__"` guard
            # (hang/duplicate work). Preload this module instead: guards
            # unguarded user scripts and warms worker imports. A no-op once
            # the server is already running.
            ctx.set_forkserver_preload(["detrpose_tpu.data.loader"])
            pool = ctx.Pool(self.num_workers, initializer=_worker_init,
                            initargs=(self.ds, self.K, self.seed, self.epoch))
            # Backpressure: Pool.imap dispatches its whole input eagerly and
            # buffers finished results unboundedly (torch's DataLoader bounds
            # this to prefetch_factor*num_workers) — on a 118k-image epoch
            # workers outpacing the train step would grow host RSS until the
            # OOM killer fires. Gate dispatch with a semaphore released once
            # per consumed item, bounding decoded-but-unconsumed items.
            import threading

            sem = threading.Semaphore(max(4 * self.num_workers, 2 * self.bs))

            def _gated(seq):
                for x in seq:
                    sem.acquire()
                    yield x

            # chunksize=1: chunksize>1 makes imap return a flattening
            # generator (no .next(timeout) — needed below for the bounded
            # fetch), and chunking is pointless for image-sized payloads.
            item_iter = pool.imap(_load_item, _gated(order), chunksize=1)
        try:
            yield from self._iter_batches(order, rng, nprng, item_iter,
                                          sem if pool is not None else None)
        finally:
            if pool is not None:
                # Unblock the pool's task-handler thread if it is parked in
                # _gated's sem.acquire — terminate() joins that thread and
                # would deadlock otherwise (early exit / exception paths).
                sem.release(len(order))
                pool.terminate()
                pool.join()

    def _iter_batches(self, order, rng, nprng, item_iter, sem=None):
        for start in range(0, len(order) - (self.bs - 1 if self.drop_last else 0), self.bs):
            idxs = order[start:start + self.bs]
            imgs, tgts = [], []
            if item_iter is not None:
                for _ in idxs:
                    # Bounded fetch: a worker that dies during startup (the
                    # classic case is a driver script missing the
                    # `if __name__ == "__main__"` guard — forkserver workers
                    # re-import __main__, same rule as torch's DataLoader)
                    # would otherwise hang this next() forever.
                    try:
                        arr, t = item_iter.next(timeout=self.worker_timeout)
                    except multiprocessing.TimeoutError:
                        raise RuntimeError(
                            f"data worker produced no item within "
                            f"{self.worker_timeout}s. If your driver script "
                            f"uses num_workers>0, its entry point must be "
                            f"wrapped in `if __name__ == '__main__':` "
                            f"(multiprocessing re-imports __main__ in "
                            f"workers).") from None
                    if sem is not None:
                        sem.release()  # one consumed -> one more dispatched
                    if arr.dtype == np.uint8:  # dequantize uint8 IPC payloads
                        arr = arr.astype(np.float32) / 255.0
                    imgs.append(arr)
                    tgts.append(t)
            else:
                for i in idxs:
                    img, t = self.ds[i]
                    imgs.append(np.asarray(img, np.float32) / 255.0)
                    h, w = imgs[-1].shape[:2]
                    tgts.append(normalize_target(t, w, h, self.K))
            images = np.stack(imgs)  # (B, H, W, 3)

            # Mixup (reference: dataloader.py:108-172, off in shipped configs):
            # blend each image with a batch-rolled partner and take the union
            # of their targets.
            if (self.train and self.mixup_prob > 0
                    and self.mixup_epochs[0] <= self.epoch < self.mixup_epochs[1]
                    and rng.random() < self.mixup_prob and len(imgs) > 1):
                beta = round(rng.uniform(0.45, 0.55), 6)
                images = images * (1 - beta) + np.roll(images, 1, axis=0) * beta
                rolled = tgts[-1:] + tgts[:-1]
                tgts = [
                    {
                        "image_id": t["image_id"],
                        "orig_size": t["orig_size"],
                        "boxes": np.concatenate([t["boxes"], r["boxes"]]),
                        "labels": np.concatenate([t["labels"], r["labels"]]),
                        "keypoints": np.concatenate([t["keypoints"], r["keypoints"]]),
                        "area": np.concatenate([t["area"], r["area"]]),
                    }
                    for t, r in zip(tgts, rolled)
                ]

            # per-batch multi-scale resize (train only, before stop_epoch)
            if self.scales and self.epoch < self.multiscale_stop_epoch:
                s = rng.choice(self.scales)
                if s != images.shape[1]:
                    images = _resize_batch(images, s)

            batch = {
                "images": images,
                "targets": pad_targets(tgts, self.max_gt),
                "image_ids": np.asarray([t["image_id"] for t in tgts]),
                "orig_sizes": np.stack([t["orig_size"] for t in tgts]),
            }
            if self.with_cdn:
                dn = build_cdn(batch["targets"], self.num_queries, self.K,
                               images.shape[1:3], nprng, self.cdn_cfg)
                if dn is not None:
                    batch["dn"] = dn
            yield batch


class Prefetcher:
    """Background-thread batch prefetch so host data prep overlaps device compute.

    Complements KeypointLoader(num_workers=N): the pool parallelizes item
    decode+transform across processes; this thread moves batch assembly off
    the dispatch thread so the train loop never waits on the host.

    Usage: `for batch in Prefetcher(loader, depth=2): ...`
    """

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        err = []
        stop = threading.Event()
        inner = iter(self.loader)

        def _put(item) -> bool:
            # Blocking put that wakes on consumer abandonment, so the worker
            # thread never parks forever in q.put when the consumer breaks
            # out mid-epoch (that parked thread used to pin the loader
            # generator open, leaking the per-epoch worker-process pool).
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                while not stop.is_set():
                    try:
                        b = next(inner)
                    except StopIteration:
                        break
                    if not _put(b):
                        break
            except BaseException as e:  # surface loader errors in the consumer
                err.append(e)
            finally:
                try:
                    # run the loader generator's finally (worker-pool
                    # teardown) no matter how this epoch ends
                    inner.close()
                except Exception:
                    pass
                _put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is _END:
                    break
                yield b
        finally:
            # normal end, consumer break/exception, or generator close: stop
            # the worker (unblocks any parked _put) and wait for pool teardown.
            # The join is bounded: a hung pool worker keeps item_iter.next()
            # parked for up to worker_timeout, and generator close must not
            # block that long (round-3 advice finding).
            stop.set()
            t.join(getattr(self.loader, "worker_timeout", 300.0) + 10.0)
            import logging
            import sys
            if t.is_alive():
                logging.getLogger(__name__).warning(
                    "Prefetcher worker did not stop within the join bound; "
                    "abandoning it (daemon thread).")
            if err and sys.exc_info()[0] is GeneratorExit:
                # consumer closed the generator: the raise below never runs,
                # so the captured loader error would be silently dropped
                logging.getLogger(__name__).warning(
                    "Prefetcher loader error dropped on close: %r", err[0])
        if err:
            raise err[0]


def _resize_batch(images: np.ndarray, size: int) -> np.ndarray:
    """Float-path antialiased bilinear resize of the collated batch.

    Reference: torchvision F.resize on the stacked float tensor
    (dataloader.py:4,105) — with an unpinned torchvision that is antialiased
    bilinear (the tensor kernel was written to match PIL's triangle filter).
    Resizing per channel as PIL mode-"F" keeps full float precision (the old
    uint8 round-trip quantized activations to 8 bits; golden-tested against
    torch interpolate(antialias=True) in tests/test_data_eval.py).
    """
    from PIL import Image

    out = np.empty((images.shape[0], size, size, 3), np.float32)
    for i, im in enumerate(images):
        for c in range(3):
            ch = Image.fromarray(np.ascontiguousarray(im[:, :, c]), mode="F")
            out[i, :, :, c] = np.asarray(
                ch.resize((size, size), Image.BILINEAR), np.float32)
    return out

"""Multi-host (multi-process) support.

TPU-native replacement for the reference's NCCL bootstrap + DDP plumbing
(src/misc/dist_utils.py:44-133): `jax.distributed.initialize()` handles the
rendezvous, the 1-D `data` mesh spans all processes' devices, and XLA emits
the gradient all-reduces. What remains host-side — and what this module
provides — is:

  * `init_distributed()` — env-gated `jax.distributed.initialize()` (explicit
    coordinator env vars or SLURM, mirroring dist_utils.py:44-63; on TPU pods
    jax auto-detects and the env vars are unnecessary).
  * per-process dataset sharding (`shard_indices`) — the DistributedSampler
    equivalent (dist_utils.py:98-108): every process shuffles the same global
    order (same seed), then takes a strided slice.
  * `merge_detections` — pickle-based all-gather of per-host evaluator
    fragments before accumulate (reference: coco_eval.py:93-105 +
    logger.all_gather:77-117), built on multihost_utils.process_allgather.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Sequence

import jax
import numpy as np

_INITIALIZED = False


def init_distributed() -> tuple:
    """Initialize jax.distributed when the environment asks for it.

    Recognized (first match wins):
      * JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID — explicit
        (the torchrun-env equivalent of dist_utils.py:44-56)
      * SLURM_NTASKS > 1 — jax's built-in SLURM cluster detection
        (dist_utils.py:57-63 equivalent)
      * TPU pods: jax.distributed.initialize() with no args auto-detects; we
        only call it when JAX_DIST_AUTO=1 to keep single-host runs untouched.

    Returns (process_index, process_count). Safe to call more than once.
    """
    global _INITIALIZED
    if not _INITIALIZED:
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        try:
            if coord and nproc and pid:
                jax.distributed.initialize(
                    coordinator_address=coord,
                    num_processes=int(nproc),
                    process_id=int(pid),
                )
                _INITIALIZED = True
            elif int(os.environ.get("SLURM_NTASKS", "1")) > 1:
                jax.distributed.initialize()  # SLURM auto-detection
                _INITIALIZED = True
            elif os.environ.get("JAX_DIST_AUTO") == "1":
                jax.distributed.initialize()  # TPU pod auto-detection
                _INITIALIZED = True
        except RuntimeError:
            # already initialized by the launcher / an earlier call
            _INITIALIZED = True
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def shard_indices(order: Sequence[int], process_index: int,
                  process_count: int) -> List[int]:
    """Strided per-process slice of a (globally shuffled) index order.

    DistributedSampler semantics (reference dist_utils.py:98-108): pad by
    wrapping so every process sees the same number of samples.
    """
    order = list(order)
    if process_count <= 1:
        return order
    n = len(order)
    per = -(-n // process_count)  # ceil
    padded = order + order[: per * process_count - n]
    return padded[process_index::process_count]


def _allgather_bytes(payload: bytes) -> List[bytes]:
    """Gather an arbitrary byte string from every process (pickle all_gather,
    reference logger.py:77-117): lengths first, then a padded uint8 gather."""
    from jax.experimental import multihost_utils

    data = np.frombuffer(payload, np.uint8)
    sizes = np.ravel(multihost_utils.process_allgather(
        np.asarray([data.size], np.int64)))
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(sizes), -1)
    return [gathered[i, : int(sizes[i])].tobytes() for i in range(len(sizes))]


def gather_lists(items: list, allgather=None, dedup_key=None) -> list:
    """Concatenate a per-process list across all hosts (for the test-dev
    results.json collection, reference src/solver/engine.py:143-157).

    ``dedup_key``: optional ``item -> hashable``. shard_indices wrap-pads the
    per-process shards, so up to process_count-1 images are processed on two
    ranks; with a key function, items whose key already appeared in an earlier
    rank's blob are dropped (first blob wins — the reference dedups merged
    images via np.unique, coco_eval.py:228)."""
    if allgather is None:
        if jax.process_count() <= 1:
            return list(items)
        allgather = _allgather_bytes
    out: list = []
    seen: set = set()
    for blob in allgather(pickle.dumps(list(items))):
        chunk = pickle.loads(blob)
        if dedup_key is None:
            out.extend(chunk)
            continue
        mine = set()
        for item in chunk:
            k = dedup_key(item)
            if k in seen:
                continue
            mine.add(k)
            out.append(item)
        seen |= mine
    return out


def merge_detections(dets: Dict[int, list], allgather=None) -> Dict[int, list]:
    """Merge per-process evaluator detection fragments across all hosts.

    Every process returns the same merged dict (reference
    coco_eval.synchronize_between_processes merges on every rank,
    coco_eval.py:93-105). Each image id belongs to exactly one logical shard
    but shard_indices wrap-pads, so an image can be evaluated on two ranks;
    first blob wins per image id (the reference dedups merged images via
    np.unique, coco_eval.py:228). `allgather` is injectable for tests.
    """
    if allgather is None:
        if jax.process_count() <= 1:
            return dets
        allgather = _allgather_bytes
    merged: Dict[int, list] = {}
    for blob in allgather(pickle.dumps(dets)):
        for img, d in pickle.loads(blob).items():
            if img not in merged:
                merged[img] = list(d)
    return merged

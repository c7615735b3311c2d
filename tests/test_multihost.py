"""Multi-host support tests (detrpose_tpu/parallel/dist.py).

Covers the DistributedSampler-equivalent sharding, the pickle-allgather
evaluator merge (with an injected fake gather, process-count-parameterized),
and — marked slow — a REAL 2-process jax.distributed CPU cluster exercising
`init_distributed` + `multihost_utils.process_allgather` end to end.
Reference behaviors: src/misc/dist_utils.py:44-133, src/data/coco_eval.py:93-105.
"""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

from detrpose_tpu.parallel.dist import (
    gather_lists, merge_detections, shard_indices,
)


@pytest.mark.parametrize("world", [1, 2, 3, 8])
def test_shard_indices_cover_and_balance(world):
    order = list(np.random.default_rng(0).permutation(23))
    shards = [shard_indices(order, r, world) for r in range(world)]
    # equal sizes (wrap-padded), union covers the dataset
    assert len({len(s) for s in shards}) == 1
    covered = set()
    for s in shards:
        covered.update(s)
    assert covered == set(order)
    # strided slices are disjoint before the wrap padding
    flat = [x for s in shards for x in s[: len(order) // world]]
    assert len(set(flat)) == len(flat)


def _fake_allgather_factory(payload_by_rank):
    def fake(_payload: bytes):
        return [pickle.dumps(p) for p in payload_by_rank]
    return fake


@pytest.mark.parametrize("world", [2, 4])
def test_merge_detections_equals_single_process(world):
    """Evaluator stats after a sharded-eval merge == single-process stats."""
    from detrpose_tpu.data.evaluator import KeypointEvaluator

    rng = np.random.default_rng(0)
    K = 17
    n_imgs = 12
    gts, all_scores, all_kpts = {}, {}, {}
    for img in range(n_imgs):
        kxy = rng.uniform(100, 400, (K, 2))
        gts[img] = {"anns": [{
            "keypoints": np.concatenate([kxy, np.ones((K, 1))], 1),
            "area": 150.0 * 150.0, "bbox": [100, 100, 150, 150],
            "iscrowd": 0, "num_keypoints": K}]}
        all_scores[img] = np.array([0.9])
        all_kpts[img] = (kxy + rng.normal(0, 2, (K, 2)))[None]
        all_kpts[img] = np.concatenate(
            [all_kpts[img], np.ones((1, K, 1))], -1)

    # single-process reference
    ev1 = KeypointEvaluator(gts, K)
    for img in range(n_imgs):
        ev1.update(img, all_scores[img], all_kpts[img])
    ev1.accumulate()
    want = ev1.summarize()

    # sharded: each "process" evaluates a strided slice, then merges
    per_rank_dets = []
    for r in range(world):
        ev = KeypointEvaluator(gts, K)
        for img in shard_indices(list(range(n_imgs)), r, world):
            ev.update(img, all_scores[img], all_kpts[img])
        per_rank_dets.append(ev.dets)
    ev_m = KeypointEvaluator(gts, K)
    # wrap-padding may duplicate an image on some rank; de-dup like the
    # padded-eval path does by keeping the first occurrence per image
    merged = merge_detections(
        {}, allgather=_fake_allgather_factory(per_rank_dets))
    seen = {}
    for img, d in merged.items():
        seen.setdefault(img, d[: len(all_scores[img])])
    ev_m.dets = seen
    ev_m.accumulate()
    got = ev_m.summarize()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


def test_gather_lists_fake():
    lists = [[{"image_id": 1}], [{"image_id": 2}, {"image_id": 3}], []]
    def fake(_):
        return [pickle.dumps(x) for x in lists]
    out = gather_lists([], allgather=fake)
    assert [r["image_id"] for r in out] == [1, 2, 3]


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = sys.argv[1]
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = sys.argv[2]
from detrpose_tpu.parallel.dist import (
    gather_lists, init_distributed, merge_detections,
)
import numpy as np

pidx, pcount = init_distributed()
assert pcount == 2, pcount
dets = {pidx: [{"score": float(pidx), "keypoints": np.zeros((17, 3))}]}
merged = merge_detections(dets)
assert sorted(merged.keys()) == [0, 1], merged.keys()
assert merged[0][0]["score"] == 0.0 and merged[1][0]["score"] == 1.0
results = gather_lists([{"image_id": pidx}])
assert sorted(r["image_id"] for r in results) == [0, 1], results
print(f"proc {pidx}: merged ok")
"""


@pytest.mark.slow
def test_real_two_process_cluster(tmp_path):
    """Spin up a genuine 2-process jax.distributed CPU cluster and run the
    evaluator merge through the real process_allgather path."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(r)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {r} failed:\n{out}"
        assert "merged ok" in out

"""Tests for the self-contained keypoint evaluator and the data pipeline."""
import json
import os
import time

import numpy as np
import pytest
from PIL import Image

from detrpose_tpu.data.evaluator import KeypointEvaluator, compute_oks
from detrpose_tpu.data.coco import CocoKeypointDataset, normalize_target, pad_targets
from detrpose_tpu.data.loader import KeypointLoader, Prefetcher, generate_scales
from detrpose_tpu.data.transforms import hflip, resize, TrainTransforms, EvalTransforms
from detrpose_tpu.ops.oks import keypoint_sigmas

K = 17


def _gt(img_id, kpts_list):
    anns = []
    for kp in kpts_list:
        kp = np.asarray(kp, np.float64).reshape(K, 3)
        xs, ys = kp[:, 0], kp[:, 1]
        bbox = [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1]
        anns.append({
            "keypoints": kp,
            "area": bbox[2] * bbox[3],
            "bbox": bbox,
            "iscrowd": 0,
            "num_keypoints": int((kp[:, 2] > 0).sum()),
        })
    return img_id, {"anns": anns}


def _rand_pose(rng, cx, cy, spread=40):
    kp = np.zeros((K, 3))
    kp[:, 0] = cx + rng.uniform(-spread, spread, K)
    kp[:, 1] = cy + rng.uniform(-spread, spread, K)
    kp[:, 2] = 2
    return kp


def test_perfect_detections_ap1():
    rng = np.random.default_rng(0)
    gts = {}
    ev_dets = []
    for img in range(4):
        poses = [_rand_pose(rng, 100 + 80 * i, 150) for i in range(3)]
        iid, g = _gt(img, poses)
        gts[iid] = g
        ev_dets.append(poses)
    ev = KeypointEvaluator(gts, K)
    for img, poses in enumerate(ev_dets):
        det = np.stack(poses)
        ev.update(img, np.linspace(0.9, 0.7, len(poses)), det)
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AR"] == pytest.approx(1.0)


def test_no_detections_ap0():
    rng = np.random.default_rng(1)
    gts = dict([_gt(0, [_rand_pose(rng, 100, 100)])])
    ev = KeypointEvaluator(gts, K)
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == pytest.approx(0.0)


def test_half_matched_ap():
    """2 GTs, 1 perfect detection + 1 garbage detection at lower score."""
    rng = np.random.default_rng(2)
    p1 = _rand_pose(rng, 100, 100)
    p2 = _rand_pose(rng, 300, 100)
    gts = dict([_gt(0, [p1, p2])])
    ev = KeypointEvaluator(gts, K)
    garbage = p2.copy()
    garbage[:, 0] += 500
    ev.update(0, [0.9, 0.8], np.stack([p1, garbage]))
    ev.accumulate()
    s = ev.summarize()
    # PR: first det TP (p=1, r=0.5), second FP. AP = 0.5 (precision 1 up to
    # recall 0.5, then 0) at every threshold.
    assert s["AP"] == pytest.approx(0.5, abs=0.01)
    assert s["AR"] == pytest.approx(0.5, abs=0.01)


def test_oks_self_is_one():
    rng = np.random.default_rng(3)
    kp = _rand_pose(rng, 50, 50)
    oks = compute_oks(kp[None], kp[None].astype(np.float64), np.asarray([1600.0]),
                      keypoint_sigmas(K).astype(np.float64))
    assert oks[0, 0] == pytest.approx(1.0)


# ---------------- data pipeline ----------------

@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 1
    for i in range(6):
        w, h = 320, 240
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"{i:04d}.jpg")
        images.append({"id": i, "file_name": f"{i:04d}.jpg", "width": w, "height": h})
        for j in range(2):
            kp = _rand_pose(rng, 80 + 100 * j, 120, 30)
            kp[:, 0] = kp[:, 0].clip(0, w - 1)
            kp[:, 1] = kp[:, 1].clip(0, h - 1)
            xs, ys = kp[:, 0], kp[:, 1]
            annotations.append({
                "id": aid, "image_id": i, "category_id": 1,
                "keypoints": kp.reshape(-1).tolist(),
                "num_keypoints": K, "iscrowd": 0,
                "bbox": [float(xs.min()), float(ys.min()),
                         float(xs.max() - xs.min()), float(ys.max() - ys.min())],
                "area": float((xs.max() - xs.min()) * (ys.max() - ys.min())),
            })
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "person"}]}
    ann_file = root / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return str(img_dir), str(ann_file)


def test_dataset_and_loader(tiny_coco):
    img_dir, ann_file = tiny_coco
    ds = CocoKeypointDataset(img_dir, ann_file, K, train=True,
                             transforms=TrainTransforms(out_size=160, policy_epochs=(0, 2, 4)))
    assert len(ds) == 6
    loader = KeypointLoader(ds, batch_size=2, num_keypoints=K, train=True,
                            max_gt=8, base_size=160)
    loader.set_epoch(1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["images"].shape[1:] == (160, 160, 3)
    assert b["targets"]["valid"].any()
    kz = b["targets"]["keypoints"]
    assert kz.shape[-1] == 3 * K
    v = b["targets"]["valid"]
    assert (kz[v][:, :2 * K] >= -0.01).all() and (kz[v][:, :2 * K] <= 1.01).all()
    assert "dn" in b
    assert b["dn"]["labels"].shape[0] == 2


def test_loader_worker_pool(tiny_coco):
    """num_workers>0 forks per-epoch item workers (reference trains with
    DataLoader num_workers=4, configs/detrpose/include/dataset.py:48).
    The worker stream must be deterministic (same seed -> identical batches)
    and structurally identical to the in-process path."""
    img_dir, ann_file = tiny_coco

    def make_loader(workers):
        ds = CocoKeypointDataset(
            img_dir, ann_file, K, train=True,
            transforms=TrainTransforms(out_size=160, policy_epochs=(0, 2, 4)))
        return KeypointLoader(ds, batch_size=2, num_keypoints=K, train=True,
                              max_gt=8, base_size=160, num_workers=workers)

    la, lb = make_loader(2), make_loader(2)
    la.set_epoch(1)
    lb.set_epoch(1)
    batches_a, batches_b = list(la), list(lb)
    assert len(batches_a) == len(batches_b) == 3
    for a, b in zip(batches_a, batches_b):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["targets"]["keypoints"],
                                      b["targets"]["keypoints"])
        np.testing.assert_array_equal(a["image_ids"], b["image_ids"])
    # structural parity with the in-process path (the augmentation RNG
    # stream differs by design: per-item seeding vs one sequential stream)
    l0 = make_loader(0)
    l0.set_epoch(1)
    batches_0 = list(l0)
    assert len(batches_0) == 3
    for a, c in zip(batches_a, batches_0):
        assert a["images"].shape == c["images"].shape
        np.testing.assert_array_equal(a["image_ids"], c["image_ids"])
        assert set(a["targets"]) == set(c["targets"])


def test_loader_worker_pool_lifecycle(tiny_coco):
    """Pool dispatch is semaphore-gated (bounded decoded-but-unconsumed
    items); the gate must not deadlock teardown on early exit, and the
    loader must be re-iterable afterwards. A worker that never produces
    raises an actionable error instead of hanging (worker_timeout)."""
    img_dir, ann_file = tiny_coco
    ds = CocoKeypointDataset(
        img_dir, ann_file, K, train=True,
        transforms=TrainTransforms(out_size=160, policy_epochs=(0, 2, 4)))
    loader = KeypointLoader(ds, batch_size=2, num_keypoints=K, train=True,
                            max_gt=8, base_size=160, num_workers=2)
    loader.set_epoch(1)
    # early exit mid-epoch: generator close must tear the pool down promptly
    it = iter(loader)
    first = next(it)
    assert first["images"].shape[0] == 2
    t0 = time.time()
    it.close()
    assert time.time() - t0 < 30.0, "pool teardown hung on early exit"
    # the same loader iterates fully again (fresh pool per epoch)
    loader.set_epoch(2)
    assert len(list(loader)) == 3
    # a stalled worker stream errors out instead of blocking forever
    loader.worker_timeout = 0.0
    loader.set_epoch(3)
    with pytest.raises(RuntimeError, match="__main__"):
        list(loader)


def test_loader_worker_pool_small_shard(tiny_coco):
    """A shard smaller than one batch with drop_last yields an empty epoch —
    no pool is spun up and teardown must not crash (the finally path used to
    call Semaphore.release(0), a ValueError)."""
    img_dir, ann_file = tiny_coco
    ds = CocoKeypointDataset(
        img_dir, ann_file, K, train=True,
        transforms=TrainTransforms(out_size=160, policy_epochs=(0, 2, 4)))
    loader = KeypointLoader(ds, batch_size=len(ds) + 2, num_keypoints=K,
                            train=True, max_gt=8, base_size=160,
                            num_workers=2)
    loader.set_epoch(1)
    assert list(loader) == []


def test_prefetcher_abandon_tears_down_pool(tiny_coco):
    """Abandoning a Prefetcher-wrapped worker loader mid-epoch must close the
    inner loader generator (worker-pool teardown) and end the prefetch
    thread — not leave the thread parked in q.put pinning the pool open."""
    import threading

    img_dir, ann_file = tiny_coco
    ds = CocoKeypointDataset(
        img_dir, ann_file, K, train=True,
        transforms=TrainTransforms(out_size=160, policy_epochs=(0, 2, 4)))
    loader = KeypointLoader(ds, batch_size=2, num_keypoints=K, train=True,
                            max_gt=8, base_size=160, num_workers=2)
    loader.set_epoch(1)
    base_threads = threading.active_count()
    pf = Prefetcher(loader, depth=1)
    it = iter(pf)
    first = next(it)
    assert first["images"].shape[0] == 2
    t0 = time.time()
    it.close()  # consumer abandons mid-epoch
    assert time.time() - t0 < 30.0, "Prefetcher close hung"
    deadline = time.time() + 10.0
    while threading.active_count() > base_threads and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= base_threads, \
        "prefetch thread leaked after consumer abandonment"


def test_eval_loader_roundtrip(tiny_coco):
    img_dir, ann_file = tiny_coco
    ds = CocoKeypointDataset(img_dir, ann_file, K, train=False,
                             transforms=EvalTransforms(out_size=160))
    loader = KeypointLoader(ds, batch_size=3, num_keypoints=K, train=False,
                            with_cdn=False, drop_last=False)
    n = sum(b["images"].shape[0] for b in loader)
    assert n == 6


def test_hflip_pairs():
    img = Image.new("RGB", (100, 80))
    kp = np.zeros((1, K, 3), np.float32)
    kp[0, 1] = [10, 20, 2]   # left eye
    kp[0, 2] = [30, 20, 2]   # right eye
    t = {"boxes": np.asarray([[5, 10, 40, 40]], np.float32),
         "labels": np.asarray([0]), "keypoints": kp,
         "area": np.asarray([100.0], np.float32)}
    img2, t2 = hflip(img, t, K)
    # after flip, slot 1 (left eye) holds the flipped right eye
    # (reference uses w - x - 1, transforms.py:94)
    np.testing.assert_allclose(t2["keypoints"][0, 1, :2], [100 - 30 - 1, 20])
    np.testing.assert_allclose(t2["keypoints"][0, 2, :2], [100 - 10 - 1, 20])


def test_generate_scales():
    s = generate_scales(640, 4)
    assert 640 in s and min(s) >= 480 and max(s) <= 800
    assert all(x % 32 == 0 for x in s)


def test_crowdpose_eval_mode():
    """use_area=False + crowdIndex splits produce AP_easy/medium/hard."""
    rng = np.random.default_rng(5)
    K14 = 14
    from detrpose_tpu.ops.oks import keypoint_sigmas as ks

    gts = {}
    dets = {}
    for img in range(4):
        kp = np.zeros((K14, 3))
        kp[:, 0] = 100 + rng.uniform(-40, 40, K14)
        kp[:, 1] = 120 + rng.uniform(-40, 40, K14)
        kp[:, 2] = 2
        bbox = [kp[:, 0].min(), kp[:, 1].min(),
                kp[:, 0].max() - kp[:, 0].min() + 1,
                kp[:, 1].max() - kp[:, 1].min() + 1]
        gts[img] = {"anns": [{"keypoints": kp, "area": bbox[2] * bbox[3],
                              "bbox": bbox, "iscrowd": 0, "num_keypoints": K14}]}
        dets[img] = kp
    crowd_index = {0: 0.05, 1: 0.05, 2: 0.5, 3: 0.9}
    ev = KeypointEvaluator(gts, K14, use_area=False, crowd_index=crowd_index)
    for img, kp in dets.items():
        ev.update(img, [0.9], kp[None])
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
    for k in ("AP_easy", "AP_medium", "AP_hard"):
        assert k in s
        assert s[k] == pytest.approx(1.0)


def test_native_matcher_equals_python():
    """The C++ matching core must agree with the Python fallback exactly."""
    from detrpose_tpu.utils.native import match_image_native

    rng = np.random.default_rng(7)
    T, D, G = 10, 12, 6
    ious = rng.uniform(0, 1, (D, G))
    thrs = np.linspace(0.5, 0.95, T)
    gt_ignore = (rng.uniform(size=G) > 0.7)
    gt_iscrowd = (rng.uniform(size=G) > 0.8)
    # sort ignore-last, like the evaluator does
    order = np.argsort(gt_ignore.astype(int), kind="stable")
    ious, gt_ignore, gt_iscrowd = ious[:, order], gt_ignore[order], gt_iscrowd[order]

    gtm_n = -np.ones((T, G), np.int64)
    dtm_n = -np.ones((T, D), np.int64)
    dti_n = np.zeros((T, D), np.uint8)
    ok = match_image_native(ious, thrs, gt_ignore, gt_iscrowd, gtm_n, dtm_n, dti_n)
    assert ok, "native matcher should build in this environment"

    gtm_p = -np.ones((T, G), np.int64)
    dtm_p = -np.ones((T, D), np.int64)
    dti_p = np.zeros((T, D), np.uint8)
    for t, thr in enumerate(thrs):
        for d in range(D):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for g in range(G):
                if gtm_p[t, g] >= 0 and not gt_iscrowd[g]:
                    continue
                if m > -1 and not gt_ignore[m] and gt_ignore[g]:
                    break
                if ious[d, g] < iou:
                    continue
                iou = ious[d, g]
                m = g
            if m == -1:
                continue
            dtm_p[t, d] = m
            gtm_p[t, m] = d
            dti_p[t, d] = gt_ignore[m]

    np.testing.assert_array_equal(gtm_n, gtm_p)
    np.testing.assert_array_equal(dtm_n, dtm_p)
    np.testing.assert_array_equal(dti_n, dti_p)


def test_resize_batch_float_path_matches_torch_antialias():
    """Multi-scale collate resize (VERDICT r2 #10): _resize_batch must act on
    the FLOAT batch (no uint8 round-trip) and match torchvision's tensor
    resize semantics — antialiased bilinear (torch interpolate antialias=True,
    which was written to match PIL's triangle filter; reference
    dataloader.py:4,105)."""
    import torch
    from detrpose_tpu.data.loader import _resize_batch

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32)
    for size in (64, 128):  # down- and up-scale
        got = _resize_batch(x, size)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(size, size),
            mode="bilinear", align_corners=False, antialias=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # float precision is preserved: values not quantized to 1/255 steps
    tiny = np.full((1, 8, 8, 3), 0.1234567, np.float32)
    out = _resize_batch(tiny, 4)
    np.testing.assert_allclose(out, 0.1234567, rtol=1e-6)

"""Keypoint-aware data augmentations (host-side, numpy + PIL).

Reference semantics: src/data/transforms.py (COCO 17-kpt flip pairs :77-101,
crop visibility zeroing :47-73, zoom-out padding :195-208, random box crop
:211-231, mosaic :314-389, epoch-policy container src/data/container.py).

All transforms are functions (image, target) -> (image, target) operating in
pixel space; `Normalize`-equivalent conversion to the network layout happens in
data/coco.normalize_target at batch assembly.
"""
from __future__ import annotations

import random
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance

FLIP_PAIRS_17 = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16)]
FLIP_PAIRS_14 = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)]


def hflip(img: Image.Image, target: Dict, num_keypoints: int = 17):
    """Horizontal flip with left/right keypoint swapping (transforms.py:77-101)."""
    w, _ = img.size
    img = img.transpose(Image.FLIP_LEFT_RIGHT)
    t = dict(target)
    boxes = t["boxes"].copy()
    if len(boxes):
        boxes = boxes[:, [2, 1, 0, 3]] * np.asarray([-1, 1, -1, 1]) + np.asarray([w, 0, w, 0])
        t["boxes"] = boxes.astype(np.float32)
    kp = t["keypoints"].copy()
    if len(kp):
        kp[:, :, 0] = w - kp[:, :, 0] - 1  # reference: transforms.py:94 (w - x - 1)
        kp[kp[:, :, 2] == 0] = 0  # unannotated stay zero
        pairs = FLIP_PAIRS_17 if num_keypoints == 17 else FLIP_PAIRS_14
        for a, b in pairs:
            kp[:, [a, b]] = kp[:, [b, a]]
        t["keypoints"] = kp
    return img, t


def resize(img: Image.Image, target: Dict, size: Tuple[int, int]):
    """Resize to exact (w, h)."""
    w0, h0 = img.size
    w1, h1 = size
    img = img.resize((w1, h1), Image.BILINEAR)
    sx, sy = w1 / w0, h1 / h0
    t = dict(target)
    if len(t["boxes"]):
        t["boxes"] = (t["boxes"] * np.asarray([sx, sy, sx, sy])).astype(np.float32)
    if len(t["keypoints"]):
        kp = t["keypoints"].copy()
        kp[:, :, 0] *= sx
        kp[:, :, 1] *= sy
        t["keypoints"] = kp
    t["area"] = (t["area"] * sx * sy).astype(np.float32)
    t["size"] = np.asarray([h1, w1], np.float32)
    return img, t


def random_zoom_out(img: Image.Image, target: Dict, rng: random.Random,
                    max_ratio: float = 2.0, fill=(123, 117, 104)):
    """Place the image on a larger canvas (transforms.py:195-208)."""
    w, h = img.size
    r = rng.uniform(1.0, max_ratio)
    nw, nh = int(w * r), int(h * r)
    left = rng.randint(0, nw - w)
    top = rng.randint(0, nh - h)
    canvas = Image.new("RGB", (nw, nh), fill)
    canvas.paste(img, (left, top))
    t = dict(target)
    if len(t["boxes"]):
        t["boxes"] = (t["boxes"] + np.asarray([left, top, left, top])).astype(np.float32)
    if len(t["keypoints"]):
        kp = t["keypoints"].copy()
        vis = kp[:, :, 2] > 0
        kp[:, :, 0] += left * vis
        kp[:, :, 1] += top * vis
        t["keypoints"] = kp
    return canvas, t


def random_crop(img: Image.Image, target: Dict, rng: random.Random,
                crop_mode: str = "zero"):
    """Crop to a random GT box region (transforms.py:211-231).

    NOTE: no *shipped* reference config instantiates RandomCrop (the policy
    lists the name, but neither include/dataset.py nor
    include/dataset_crowdpose.py put one in the transform stack) — this is a
    capability-parity op, off by default in TrainTransforms.

    crop_mode:
      "zero"  — COCO semantics (src/data/transforms.py:47-73): out-of-crop
                keypoints get visibility 0 and instances left with no visible
                keypoints are dropped.
      "clamp" — CrowdPose semantics (src/data/transforms_crowdpose.py:57-66):
                keypoints are clamped to the crop border, visibility is kept,
                and instances are dropped only when their cropped box has zero
                area (:44-55).
    """
    if len(target["boxes"]) == 0:
        return img, target
    i = rng.randrange(len(target["boxes"]))
    x0, y0, x1, y1 = target["boxes"][i]
    w, h = img.size
    x0, y0 = int(max(0, x0)), int(max(0, y0))
    x1, y1 = int(min(w, x1)), int(min(h, y1))
    if x1 - x0 < 8 or y1 - y0 < 8:
        return img, target
    return crop(img, target, (x0, y0, x1 - x0, y1 - y0), crop_mode)


def crop(img: Image.Image, target: Dict, region: Tuple[int, int, int, int],
         crop_mode: str = "zero"):
    """Crop to region (x0, y0, w, h); see random_crop for mode semantics.

    Golden-tested against the reference's crop functions
    (tests/test_transforms_golden.py): "zero" vs src/data/transforms.py:44-73,
    "clamp" vs src/data/transforms_crowdpose.py:16-67.
    """
    x0, y0, cw, ch = region
    img = img.crop((x0, y0, x0 + cw, y0 + ch))
    t = dict(target)
    boxes = t["boxes"] - np.asarray([x0, y0, x0, y0], np.float32)
    boxes[:, 0::2] = boxes[:, 0::2].clip(0, cw)
    boxes[:, 1::2] = boxes[:, 1::2].clip(0, ch)
    kp = t["keypoints"].copy()
    if crop_mode == "clamp":
        # CrowdPose: shift, clamp to the crop, keep visibility; drop only
        # zero-area boxes; area recomputed from the cropped box
        # (transforms_crowdpose.py:26-66)
        if len(kp):
            kp[:, :, 0] = (kp[:, :, 0] - x0).clip(0, cw)
            kp[:, :, 1] = (kp[:, :, 1] - y0).clip(0, ch)
        keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        area = ((boxes[:, 2] - boxes[:, 0])
                * (boxes[:, 3] - boxes[:, 1])).astype(np.float32)
    else:
        # COCO: zero visibility outside the crop; drop instances left with no
        # visible keypoints (transforms.py:44-73); area kept as-is (:59-62
        # recomputes box area only into 'area' for boxes — matched below)
        keep = np.ones(len(boxes), bool)
        area = ((boxes[:, 2] - boxes[:, 0])
                * (boxes[:, 3] - boxes[:, 1])).astype(np.float32)
        if len(kp):
            kp[:, :, 0] -= x0
            kp[:, :, 1] -= y0
            # inclusive bounds: 0 <= x <= w (transforms.py:54-59)
            inside = ((kp[:, :, 0] >= 0) & (kp[:, :, 0] <= cw)
                      & (kp[:, :, 1] >= 0) & (kp[:, :, 1] <= ch))
            kp[:, :, 2] = kp[:, :, 2] * inside
            kp[kp[:, :, 2] == 0] = 0
            keep = kp[:, :, 2].sum(1) > 0
    t["boxes"] = boxes[keep].astype(np.float32)
    t["keypoints"] = kp[keep] if len(kp) else kp
    t["labels"] = t["labels"][keep]
    t["area"] = np.asarray(area)[keep]
    return img, t


def color_jitter(img: Image.Image, rng: random.Random, brightness=0.4,
                 contrast=0.4, saturation=0.4):
    for enh, mag in [(ImageEnhance.Brightness, brightness),
                     (ImageEnhance.Contrast, contrast),
                     (ImageEnhance.Color, saturation)]:
        f = rng.uniform(1 - mag, 1 + mag)
        img = enh(img).enhance(f)
    return img


def mosaic(dataset, idx: int, rng: random.Random, out_size: int = 640,
           num_keypoints: int = 17):
    """2x2 mosaic of 4 samples (transforms.py:314-389)."""
    cell = out_size // 2
    ids = [idx] + [rng.randrange(len(dataset)) for _ in range(3)]
    canvas = Image.new("RGB", (out_size, out_size))
    all_t: Dict[str, List] = {"boxes": [], "labels": [], "keypoints": [], "area": []}
    merged = None
    for i, sid in enumerate(ids):
        img, t = dataset.load_raw(sid)
        img, t = resize(img, t, (cell, cell))
        ox, oy = (i % 2) * cell, (i // 2) * cell
        canvas.paste(img, (ox, oy))
        if merged is None:
            merged = {k: t[k] for k in ("image_id", "orig_size")}
        if len(t["boxes"]):
            all_t["boxes"].append(t["boxes"] + np.asarray([ox, oy, ox, oy], np.float32))
            all_t["labels"].append(t["labels"])
            kp = t["keypoints"].copy()
            vis = kp[:, :, 2] > 0
            kp[:, :, 0] += ox * vis
            kp[:, :, 1] += oy * vis
            all_t["keypoints"].append(kp)
            all_t["area"].append(t["area"])
    K = num_keypoints
    target = {
        "image_id": merged["image_id"],
        "orig_size": np.asarray([out_size, out_size], np.float32),
        "size": np.asarray([out_size, out_size], np.float32),
        "boxes": (np.concatenate(all_t["boxes"]) if all_t["boxes"]
                  else np.zeros((0, 4), np.float32)),
        "labels": (np.concatenate(all_t["labels"]) if all_t["labels"]
                   else np.zeros((0,), np.int32)),
        "keypoints": (np.concatenate(all_t["keypoints"]) if all_t["keypoints"]
                      else np.zeros((0, K, 3), np.float32)),
        "area": (np.concatenate(all_t["area"]) if all_t["area"]
                 else np.zeros((0,), np.float32)),
    }
    return canvas, target


class TrainTransforms:
    """Epoch-aware augmentation policy (reference: src/data/container.py).

    policy_epochs = (mosaic_until_warmup, aug_stop_1, aug_stop_2): mosaic and
    crop/zoom-out are mutually exclusive per sample; all heavy augs switch off
    after the policy window, mirroring `stop_epoch` behavior.
    """

    def __init__(self, out_size: int = 640, num_keypoints: int = 17,
                 policy_epochs: Sequence[int] = (5, 29, 48), seed: int = 0,
                 use_mosaic: bool = True, mosaic_prob: float = 0.5,
                 use_crop: bool = False, crop_prob: float = 0.8,
                 crop_mode: str = "zero"):
        self.out_size = out_size
        self.K = num_keypoints
        self.policy_epochs = policy_epochs
        self.epoch = 0
        self.rng = random.Random(seed)
        self.use_mosaic = use_mosaic
        self.mosaic_prob = mosaic_prob
        # No shipped reference config crops (see random_crop docstring);
        # use_crop exists for capability parity with the RandomCrop /
        # transforms_crowdpose.crop classes.
        self.use_crop = use_crop
        self.crop_prob = crop_prob
        self.crop_mode = crop_mode

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __call__(self, img, target, dataset=None, index=None):
        rng = self.rng
        e = self.epoch
        p0, p1, p2 = self.policy_epochs
        heavy_on = p0 <= e < p2

        # container.py:44-63: mosaic is rolled (prob mosaic_prob) only inside
        # [p0, p1); when it fires, ZoomOut/Crop are skipped for this sample.
        with_mosaic = (heavy_on and e < p1 and self.use_mosaic
                       and dataset is not None and index is not None
                       and rng.random() <= self.mosaic_prob)
        if with_mosaic:
            img, target = mosaic(dataset, index, rng, self.out_size, self.K)
        elif heavy_on:
            if rng.random() < 0.5:  # RandomZoomOut internal p (dataset.py:34)
                img, target = random_zoom_out(img, target, rng)
            if self.use_crop and rng.random() < self.crop_prob:
                img, target = random_crop(img, target, rng, self.crop_mode)

        if rng.random() < 0.5:
            img, target = hflip(img, target, self.K)
        img = color_jitter(img, rng)
        img, target = resize(img, target, (self.out_size, self.out_size))
        return img, target


class EvalTransforms:
    """Deterministic eval path: resize to the eval resolution."""

    def __init__(self, out_size: int = 640):
        self.out_size = out_size

    def __call__(self, img, target, dataset=None, index=None):
        return resize(img, target, (self.out_size, self.out_size))

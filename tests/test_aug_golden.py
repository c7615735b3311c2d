"""Golden tests for the round-3 augmentation-fidelity fixes (VERDICT r2 #2):
RandomZoomOut geometry, Mosaic cell layout, and the ColorJitter protocol are
checked against the LIVE reference classes (refsrc.data.transforms) with
synchronized randomness, in the style of test_transforms_golden.py.
"""
import colorsys
import random as pyrandom
from unittest import mock

import numpy as np
import pytest
import torch
from PIL import Image

from detrpose_tpu.data.transforms import (
    adjust_hue, mosaic, random_zoom_out, sample_jitter_params,
)

K = 17


def _load_ref_transforms():
    import ref_loader

    ref_loader.install_torchvision_stub()
    ref_loader.load_reference()
    import importlib

    return importlib.import_module("refsrc.data.transforms")


class _FixedRng:
    """random.Random stand-in emitting scripted values."""

    def __init__(self, uniforms):
        self.uniforms = list(uniforms)

    def uniform(self, a, b):
        v = self.uniforms.pop(0)
        assert a <= v <= b, (a, v, b)
        return v


def _np_target(rng, n, w, h):
    boxes = []
    for _ in range(n):
        x0, y0 = rng.uniform(0, w * 0.6), rng.uniform(0, h * 0.6)
        boxes.append([x0, y0, x0 + rng.uniform(10, w * 0.3),
                      y0 + rng.uniform(10, h * 0.3)])
    boxes = np.asarray(boxes, np.float32)
    kp = rng.uniform(0, min(w, h), (n, K, 3)).astype(np.float32)
    kp[:, :, 2] = (rng.random((n, K)) > 0.3).astype(np.float32)
    kp[kp[:, :, 2] == 0] = 0
    return {
        "boxes": boxes,
        "labels": np.zeros(n, np.int64),
        "area": (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
        "keypoints": kp,
        "image_id": 0,
        "orig_size": np.asarray([h, w], np.float32),
    }


def _to_torch(t):
    return {
        "boxes": torch.from_numpy(t["boxes"].copy()),
        "labels": torch.from_numpy(t["labels"].copy()),
        "area": torch.from_numpy(np.asarray(t["area"]).copy()),
        "keypoints": torch.from_numpy(t["keypoints"].copy()),
        "size": torch.tensor([t["orig_size"][0], t["orig_size"][1]]),
    }


@pytest.mark.parametrize("ratio", [1.0, 1.3, 2.5])
def test_zoom_out_matches_reference(ratio):
    """Same zoom ratio through the live reference RandomZoomOut (+pad) and our
    random_zoom_out: identical canvas size, centered placement, box/keypoint
    shifts, zero fill."""
    t_ref = _load_ref_transforms()
    rng = np.random.default_rng(0)
    W, H = 320, 240
    img = Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    tgt = _np_target(rng, 4, W, H)

    zo = t_ref.RandomZoomOut(p=0.5, side_range=[1, 2.5])
    ref_tgt = _to_torch(tgt)
    with mock.patch.object(pyrandom, "random", return_value=0.0), \
         mock.patch.object(np.random, "uniform",
                           return_value=np.asarray([ratio])):
        ref_img, ref_out = zo(img, ref_tgt)

    got_img, got = random_zoom_out(img, dict(tgt), _FixedRng([ratio]))

    assert got_img.size == ref_img.size
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(ref_img))
    np.testing.assert_allclose(got["boxes"], ref_out["boxes"].numpy(), atol=1e-5)
    np.testing.assert_allclose(got["keypoints"], ref_out["keypoints"].numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(got["size"],
                               ref_out["size"].numpy().astype(np.float32))


class _PairDataset:
    """Minimal dataset driving both mosaic implementations."""

    def __init__(self, seed=0, n=6):
        rng = np.random.default_rng(seed)
        self.samples = []
        for i in range(n):
            w = int(rng.integers(200, 500))
            h = int(rng.integers(150, 400))
            img = Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
            self.samples.append((img, _np_target(rng, 3, w, h)))
        self.epoch = 0

    def __len__(self):
        return len(self.samples)

    # ours
    def load_raw(self, i):
        img, t = self.samples[i]
        return img, {k: (v.copy() if hasattr(v, "copy") else v)
                     for k, v in t.items()}

    # reference Mosaic.load_samples_from_dataset calls dataset.load_item
    def load_item(self, i):
        img, t = self.samples[i]
        return img, _to_torch(t)


@pytest.mark.parametrize("seed", [0, 1])
def test_mosaic_matches_reference(seed):
    """Same 4 samples through the live reference Mosaic and ours: identical
    canvas (aspect-preserving shorter-side-320 cells on a 2*max_w x 2*max_h
    black canvas) and identical merged targets."""
    t_ref = _load_ref_transforms()
    ds = _PairDataset(seed)
    partner_ids = [1, 2, 3]

    ref_mosaic = t_ref.Mosaic(output_size=320, probability=1.0)
    img0, tgt0 = ds.load_item(0)
    with mock.patch.object(pyrandom, "choices",
                           return_value=list(partner_ids)):
        ref_img, ref_out = ref_mosaic(img0, tgt0, ds)

    got_img, got = mosaic(ds, 0, pyrandom.Random(0), cell_size=320,
                          num_keypoints=K, sample_ids=partner_ids)

    assert got_img.size == ref_img.size
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(ref_img))
    np.testing.assert_allclose(got["boxes"], ref_out["boxes"].numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got["keypoints"], ref_out["keypoints"].numpy(),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(got["area"], ref_out["area"].numpy(),
                               rtol=1e-5, atol=1e-3)
    assert len(got["labels"]) == len(ref_out["labels"])


def test_color_jitter_protocol():
    """Sampling protocol equals the reference ColorJitter (transforms.py:
    391-443): all-or-nothing p, 4 ops in random order, factor ranges
    [1-m, 1+m] (hue: [-m, m])."""
    n_skip = 0
    orders = set()
    for seed in range(300):
        params = sample_jitter_params(pyrandom.Random(seed))
        if not params:
            n_skip += 1
            continue
        names = [n for n, _ in params]
        assert sorted(names) == ["brightness", "contrast", "hue", "saturation"]
        orders.add(tuple(names))
        for name, f in params:
            if name == "hue":
                assert -0.4 <= f <= 0.4
            else:
                assert 0.6 <= f <= 1.4
    # p = 0.5 all-or-nothing
    assert 100 <= n_skip <= 200, n_skip
    # random order: many distinct permutations occur
    assert len(orders) >= 12, orders


def test_adjust_hue_matches_colorsys():
    """Hue shift agrees with an independent colorsys HSV roundtrip within
    uint8 quantization."""
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (8, 8, 3), np.uint8))
    for hf in (-0.4, -0.1, 0.25, 0.4):
        got = np.asarray(adjust_hue(img, hf), np.float64)
        want = np.empty_like(got)
        src = np.asarray(img, np.float64) / 255.0
        for y in range(8):
            for x in range(8):
                h, s, v = colorsys.rgb_to_hsv(*src[y, x])
                # PIL quantizes H to uint8 steps; replicate the wraparound
                h8 = (int(round(h * 255)) + (int(hf * 255) & 0xFF)) % 256
                r, g, b = colorsys.hsv_to_rgb(h8 / 255.0, s, v)
                want[y, x] = np.asarray([r, g, b]) * 255.0
        assert np.abs(got - want).max() <= 6.0  # HSV uint8 roundtrip slack


def test_hue_changes_pixels_but_preserves_luma_rank():
    """adjust_hue actually modifies colors (the round-2 gap: hue was absent)."""
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8))
    out = adjust_hue(img, 0.3)
    assert np.abs(np.asarray(out, np.int16) - np.asarray(img, np.int16)).max() > 10
    # value channel untouched by a pure hue rotation
    v_in = np.asarray(img.convert("HSV"))[..., 2]
    v_out = np.asarray(out.convert("HSV"))[..., 2]
    np.testing.assert_array_equal(v_in, v_out)

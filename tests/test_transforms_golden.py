"""Golden tests of the crop transform against the live reference functions.

torchvision is absent here, so a minimal stub (PIL-backed F.crop/F.hflip) is
installed before importing the reference modules — the functions under test
only use torch tensor math + F.crop.

  * "zero" mode  vs src/data/transforms.py::crop (COCO: out-of-crop keypoints
    lose visibility, kpt-less instances dropped)
  * "clamp" mode vs src/data/transforms_crowdpose.py::crop (CrowdPose:
    keypoints clamped to the crop border, zero-area boxes dropped)
"""
import numpy as np
import pytest
import torch
from PIL import Image

from detrpose_tpu.data.transforms import crop as jax_crop


def _load_ref_transforms():
    import ref_loader

    ref_loader.install_torchvision_stub()
    ref_loader.load_reference()  # installs refsrc namespaces + omegaconf stub
    import importlib

    t_coco = importlib.import_module("refsrc.data.transforms")
    t_crowd = importlib.import_module("refsrc.data.transforms_crowdpose")
    return t_coco, t_crowd


def _rand_target(rng, n, K, w, h):
    boxes = []
    for _ in range(n):
        x0, y0 = rng.uniform(0, w * 0.8), rng.uniform(0, h * 0.8)
        boxes.append([x0, y0, x0 + rng.uniform(10, w - x0),
                      y0 + rng.uniform(10, h - y0)])
    boxes = np.asarray(boxes, np.float32)
    kp = rng.uniform(-20, max(w, h) + 20, (n, K, 3)).astype(np.float32)
    kp[:, :, 2] = (rng.random((n, K)) > 0.3).astype(np.float32)
    kp[kp[:, :, 2] == 0] = 0
    return {
        "boxes": boxes,
        "labels": np.zeros(n, np.int64),
        "iscrowd": np.zeros(n, np.int64),
        "area": (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]),
        "keypoints": kp,
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("mode", ["zero", "clamp"])
def test_crop_matches_reference(seed, mode):
    t_coco, t_crowd = _load_ref_transforms()
    rng = np.random.default_rng(seed)
    W, H, K = 480, 360, 14 if mode == "clamp" else 17
    img = Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8))
    tgt = _rand_target(rng, 5, K, W, H)

    # region in reference layout (i=y0, j=x0, h, w)
    x0, y0 = int(rng.integers(0, W // 3)), int(rng.integers(0, H // 3))
    cw, ch = int(rng.integers(50, W - x0)), int(rng.integers(50, H - y0))

    ref_tgt = {
        "boxes": torch.from_numpy(tgt["boxes"].copy()),
        "labels": torch.from_numpy(tgt["labels"].copy()),
        "iscrowd": torch.from_numpy(tgt["iscrowd"].copy()),
        "area": torch.from_numpy(tgt["area"].copy()),
        "keypoints": torch.from_numpy(tgt["keypoints"].copy()),
    }
    ref_fn = t_crowd.crop if mode == "clamp" else t_coco.crop
    ref_img, ref_out = ref_fn(img, ref_tgt, (y0, x0, ch, cw))

    got_img, got = jax_crop(img, tgt, (x0, y0, cw, ch), crop_mode=mode)

    assert got_img.size == ref_img.size
    np.testing.assert_allclose(got["boxes"], ref_out["boxes"].numpy(),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(got["keypoints"],
                               ref_out["keypoints"].numpy(),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(got["area"], ref_out["area"].numpy(),
                               rtol=1e-6, atol=1e-3)
    np.testing.assert_array_equal(got["labels"], ref_out["labels"].numpy())

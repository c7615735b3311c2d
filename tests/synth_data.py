"""Synthetic COCO-format dataset builder for tests."""
import json
import os

import numpy as np
from PIL import Image


def rand_pose(rng, cx, cy, K=17, spread=40):
    kp = np.zeros((K, 3))
    kp[:, 0] = cx + rng.uniform(-spread, spread, K)
    kp[:, 1] = cy + rng.uniform(-spread, spread, K)
    kp[:, 2] = 2
    return kp


def make_tiny_coco(root, n_images=6, K=17, w=320, h=240, people=2, seed=0):
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, f"{i:04d}.jpg"))
        images.append({"id": i, "file_name": f"{i:04d}.jpg", "width": w, "height": h})
        for j in range(people):
            kp = rand_pose(rng, 80 + 100 * j, 120, K, 30)
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
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    return img_dir, ann_file

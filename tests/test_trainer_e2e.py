"""End-to-end Trainer smoke: fit one epoch on synthetic data + evaluate.

Exercises the full lifecycle: loader -> CDN -> sharded train step -> EMA ->
checkpoint -> eval decode -> OKS AP evaluator -> log.txt.
"""
import json
import os

import numpy as np
import pytest

from synth_data import make_tiny_coco

K = 17


@pytest.mark.slow
def test_trainer_fit_and_eval(tmp_path):
    from detrpose_tpu.configs import model_config, build_model
    from detrpose_tpu.data.coco import CocoKeypointDataset
    from detrpose_tpu.data.transforms import TrainTransforms, EvalTransforms
    from detrpose_tpu.data.loader import KeypointLoader
    from detrpose_tpu.train.trainer import Trainer

    img_dir, ann_file = make_tiny_coco(str(tmp_path), n_images=4, w=160, h=160)
    mcfg = model_config("n")
    model = build_model(mcfg)

    tds = CocoKeypointDataset(
        img_dir, ann_file, K, train=True,
        transforms=TrainTransforms(out_size=160, num_keypoints=K,
                                   policy_epochs=(99, 100, 101)))  # no heavy augs
    train_loader = KeypointLoader(tds, batch_size=2, num_keypoints=K, train=True,
                                  base_size=160, num_queries=mcfg.num_queries)
    vds = CocoKeypointDataset(img_dir, ann_file, K, train=False,
                              transforms=EvalTransforms(out_size=160))
    val_loader = KeypointLoader(vds, batch_size=2, num_keypoints=K, train=False,
                                with_cdn=False, drop_last=False)
    val_gts = {
        i: {"anns": [
            {"keypoints": np.asarray(a["keypoints"], np.float64).reshape(K, 3),
             "area": a["area"], "bbox": a["bbox"], "iscrowd": 0,
             "num_keypoints": K}
            for a in vds.anns_by_img.get(i, [])
        ]}
        for i in vds.ids
    }

    out_dir = str(tmp_path / "out")
    trainer = Trainer(model, mcfg, train_loader, val_loader, val_gts,
                      output_dir=out_dir, epochs=1, tensorboard=False,
                      n_devices=2)  # batch 2 must divide the mesh
    best = trainer.fit()
    # AP is near zero with 1 epoch of random init; the contract is: it ran,
    # losses were finite, artifacts exist.
    assert os.path.exists(os.path.join(out_dir, "log.txt"))
    with open(os.path.join(out_dir, "log.txt")) as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec["train_loss_total"])
    assert "AP" in rec
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))
    # resume restores
    trainer.resume(os.path.join(out_dir, "checkpoint"))
    assert trainer.start_epoch == 1


@pytest.mark.slow
def test_trainer_load_torch_weights(tmp_path):
    """Zoo .pth -> Trainer -> evaluate round-trip (the AP-parity route)."""
    import sys
    import torch

    sys.path.insert(0, os.path.dirname(__file__))
    from ref_loader import build_reference_model
    from detrpose_tpu.configs import build_model
    from detrpose_tpu.data.coco import CocoKeypointDataset
    from detrpose_tpu.data.transforms import EvalTransforms
    from detrpose_tpu.data.loader import KeypointLoader
    from detrpose_tpu.train.trainer import Trainer

    torch.manual_seed(0)
    ref_model, mcfg = build_reference_model("n", eval_hw=(160, 160))
    pth = str(tmp_path / "zoo.pth")
    torch.save({"model": ref_model.state_dict()}, pth)

    img_dir, ann_file = make_tiny_coco(str(tmp_path), n_images=2, w=160, h=160)
    vds = CocoKeypointDataset(img_dir, ann_file, K, train=False,
                              transforms=EvalTransforms(out_size=160))
    val_loader = KeypointLoader(vds, batch_size=2, num_keypoints=K, train=False,
                                with_cdn=False, drop_last=False)
    val_gts = {
        i: {"anns": [
            {"keypoints": np.asarray(a["keypoints"], np.float64).reshape(K, 3),
             "area": a["area"], "bbox": a["bbox"], "iscrowd": 0,
             "num_keypoints": K}
            for a in vds.anns_by_img.get(i, [])
        ]}
        for i in vds.ids
    }
    model = build_model(mcfg)
    trainer = Trainer(model, mcfg, val_loader=val_loader, val_gts=val_gts,
                      output_dir=str(tmp_path / "out"), tensorboard=False,
                      n_devices=2)
    trainer.load_torch_weights(pth, prefer_ema=False)
    stats = trainer.evaluate(use_ema=False)
    assert "AP" in stats  # random weights -> AP ~0; contract: pipeline runs


@pytest.mark.slow
def test_trainer_test_writes_results_json(tmp_path):
    from detrpose_tpu.configs import model_config, build_model
    from detrpose_tpu.data.coco import CocoKeypointDataset
    from detrpose_tpu.data.transforms import EvalTransforms
    from detrpose_tpu.data.loader import KeypointLoader, Prefetcher
    from detrpose_tpu.train.trainer import Trainer

    img_dir, ann_file = make_tiny_coco(str(tmp_path), n_images=2, w=160, h=160)
    mcfg = model_config("n")
    model = build_model(mcfg)
    vds = CocoKeypointDataset(img_dir, ann_file, K, train=False,
                              transforms=EvalTransforms(out_size=160))
    # Prefetcher wraps the loader, as train.py does for training
    val_loader = Prefetcher(KeypointLoader(vds, batch_size=2, num_keypoints=K,
                                           train=False, with_cdn=False,
                                           drop_last=False))
    trainer = Trainer(model, mcfg, val_loader=val_loader, val_gts={},
                      output_dir=str(tmp_path / "out"), tensorboard=False,
                      n_devices=2)
    out = trainer.test(score_thresh=0.0)
    with open(out) as f:
        results = json.load(f)
    # 2 images x top-60 detections
    assert len(results) == 2 * 60
    r = results[0]
    assert set(r) == {"image_id", "category_id", "keypoints", "score"}
    assert len(r["keypoints"]) == 3 * K

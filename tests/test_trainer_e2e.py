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
                                  base_size=160, num_queries=mcfg.num_queries,
                                  num_workers=2)  # exercise the forked
    # item-worker pool inside a real fit (train.py defaults to 4)
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

    # natively-trained orbax checkpoint -> inference CLI pipeline (reference
    # workflow: train.py -r checkpoint.pth + torch_inf.py, prefers EMA —
    # tools/inference/torch_inf.py:141-151)
    import jax.numpy as jnp
    from detrpose_tpu.tools.infer import build_pipeline

    run, variables = build_pipeline("n", K, os.path.join(out_dir, "best"),
                                    res=160)
    img = np.zeros((120, 160, 3), np.uint8)
    scores, labels, kpts = run(variables, jnp.asarray(img),
                               jnp.asarray([160, 120], jnp.float32))
    assert np.isfinite(np.asarray(scores, np.float32)).all()
    assert np.asarray(kpts).shape == (1, 60, K, 3)

    # same checkpoint through the deployment exporter + reload
    from detrpose_tpu.tools.export import export_model, load_exported

    exp = export_model("n", K, ckpt=os.path.join(out_dir, "best"), batch=1,
                       res=160, out_dir=str(tmp_path / "exp"))
    run2 = load_exported(exp)
    s2, _, k2 = run2(np.zeros((1, 160, 160, 3), np.float32),
                     np.full((1, 2), 160.0, np.float32))
    assert np.isfinite(np.asarray(s2, np.float32)).all()
    assert np.asarray(k2).shape == (1, 60, K, 3)


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


def test_best_metric_holder_dual_tracking():
    """Regular and EMA best streams tracked separately (reference
    src/misc/metrics.py:12-84); checkpoints would diverge when EMA lags."""
    from detrpose_tpu.utils.meters import BestMetricHolder

    h = BestMetricHolder(use_ema=True)
    # epoch 0: regular 0.3, ema lags at 0.1
    assert h.update(0.3, 0, is_ema=False) is True   # overall best
    assert h.update(0.1, 0, is_ema=True) is False
    # epoch 1: regular dips, ema catches up past regular
    assert h.update(0.25, 1, is_ema=False) is False
    assert h.update(0.35, 1, is_ema=True) is True
    s = h.summary()
    assert s["regular_best_res"] == 0.3 and s["regular_best_ep"] == 0
    assert s["ema_best_res"] == 0.35 and s["ema_best_ep"] == 1
    assert s["all_best_res"] == 0.35 and s["all_best_ep"] == 1
    # non-EMA mode: single stream
    h2 = BestMetricHolder(use_ema=False)
    assert h2.update(0.5, 3) is True
    assert h2.update(0.4, 4) is False
    assert h2.summary() == {"best_res": 0.5, "best_ep": 3}


def test_best_metric_holder_update_stream():
    """update_stream gates on the PER-STREAM best, so a regular-weights
    improvement that is still below the overall (EMA) best must still
    trigger (it gates the best_regular checkpoint write in Trainer.fit)."""
    from detrpose_tpu.utils.meters import BestMetricHolder

    h = BestMetricHolder(use_ema=True)
    assert h.update_stream(0.50, 3, is_ema=True) is True
    # regular improves to 0.49 < overall best 0.50: overall-best gating
    # (plain update semantics) would skip the checkpoint; the stream signal
    # fires. A twin holder shows the contrast on the same sequence.
    h_overall = BestMetricHolder(use_ema=True)
    h_overall.update(0.50, 3, is_ema=True)
    assert h_overall.update(0.49, 7, is_ema=False) is False
    assert h.update_stream(0.49, 7, is_ema=False) is True
    assert h.update_stream(0.48, 8, is_ema=False) is False
    s = h.summary()
    assert s["regular_best_res"] == 0.49 and s["regular_best_ep"] == 7
    assert s["all_best_res"] == 0.50
    # non-EMA mode falls back to the single stream
    h2 = BestMetricHolder(use_ema=False)
    assert h2.update_stream(0.5, 0) is True
    assert h2.update_stream(0.4, 1) is False

"""End-to-end parity: reference torch DETRPose vs our JAX model with converted
weights, on the same random input. This validates every layer's numerics AND
the weight converter in one shot — it is the round-1 stand-in for COCO AP
parity (no network access to fetch zoo checkpoints here; the converter applies
unchanged to them since the key space is identical).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import build_model
from detrpose_tpu.utils.convert import convert_state_dict

from ref_loader import build_reference_model


@pytest.mark.parametrize("size,hw", [("n", (160, 160)), ("s", (128, 128))])
@pytest.mark.slow  # full-model compile
def test_full_model_parity(size, hw):
    torch.manual_seed(0)
    ref_model, cfg = build_reference_model(size, eval_hw=hw)
    sd = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
    # With random weights the 60-of-S anchor selection scores are packed within
    # ~1e-5, so torch and jax tie-break the top-k ORDER differently and the
    # per-slot (tgt_embed) outputs then legitimately differ. Spread the
    # selection scores (same doctored weights on both sides) so ordering is
    # well-defined; trained checkpoints have well-separated scores anyway.
    sd["transformer.enc_out_class_embed.weight"] = (
        sd["transformer.enc_out_class_embed.weight"] * 50.0)
    ref_model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    model = build_model(cfg)
    H, W = hw
    x_np = np.random.default_rng(0).uniform(0, 1, (2, H, W, 3)).astype(np.float32)

    # train=True so every head (incl. train-only LQE/class heads) is in the tree.
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((2, H, W, 3)), train=True)
    )
    variables = convert_state_dict(sd, jax.tree.map(lambda x: x, dict(template)))

    out_j = model.apply(variables, jnp.asarray(x_np), train=False)

    with torch.no_grad():
        out_t = ref_model(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))

    logits_t = out_t["pred_logits"].numpy()
    kpts_t = out_t["pred_keypoints"].numpy()
    logits_j = np.asarray(out_j["pred_logits"])
    kpts_j = np.asarray(out_j["pred_keypoints"])

    assert logits_j.shape == logits_t.shape
    assert kpts_j.shape == kpts_t.shape
    dq_l = np.abs(logits_j - logits_t).max(-1)  # (B, nq)
    dq_k = np.abs(kpts_j - kpts_t).max(-1)
    assert np.median(dq_l) < 1e-3, np.median(dq_l)
    assert np.median(dq_k) < 1e-3, np.median(dq_k)
    # Tie-flips persist for anchors with near-identical features (their score
    # gap scales with the weights, so no doctoring can separate them); flipped
    # slots legitimately differ because tgt_embed is per-slot. Stage-wise
    # golden tests (ops/backbone/encoder/decoder bisects) pin the numerics to
    # ~1e-6; this test guards end-to-end wiring.
    assert (dq_l < 2e-3).mean() >= 0.80, (dq_l < 2e-3).mean()
    assert (dq_k < 2e-3).mean() >= 0.80, (dq_k < 2e-3).mean()


def test_stagewise_parity_exact():
    """Backbone / encoder / transformer each bit-close vs torch with synced
    inputs — no top-k tie ambiguity, strict tolerances."""
    from detrpose_tpu.models import HGNetv2, HybridEncoder, Transformer

    torch.manual_seed(0)
    HW = 128
    ref_model, cfg = build_reference_model("n", eval_hw=(HW, HW))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    model = build_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)),
                           train=True))
    variables = convert_state_dict(sd, dict(template))
    x_np = np.random.default_rng(0).uniform(0, 1, (1, HW, HW, 3)).astype(np.float32)
    x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))

    with torch.no_grad():
        feats_t = ref_model.backbone(x_t)
        efeats_t = ref_model.encoder(feats_t)
        out_t = ref_model.transformer(efeats_t, None, None)

    bb = HGNetv2(arch=cfg.backbone_name, use_lab=cfg.use_lab,
                 return_idx=tuple(cfg.return_idx))
    feats_j = bb.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(x_np), train=False)
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)

    enc = HybridEncoder(
        in_channels=tuple(cfg.in_channels), feat_strides=tuple(cfg.feat_strides),
        n_levels=cfg.n_levels, hidden_dim=cfg.hidden_dim,
        dim_feedforward=cfg.enc_dim_feedforward,
        use_encoder_idx=tuple(cfg.use_encoder_idx),
        expansion=cfg.expansion, depth_mult=cfg.depth_mult)
    efeats_j = enc.apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        [jnp.asarray(f.permute(0, 2, 3, 1).numpy()) for f in feats_t], train=False)
    for fj, ft in zip(efeats_j, efeats_t):
        np.testing.assert_allclose(
            np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4)

    tr = Transformer(
        hidden_dim=cfg.hidden_dim, num_queries=cfg.num_queries,
        num_decoder_layers=cfg.num_decoder_layers,
        dim_feedforward=cfg.dec_dim_feedforward,
        num_feature_levels=cfg.n_levels, dec_n_points=cfg.dec_n_points,
        num_classes=cfg.num_classes, num_body_points=cfg.num_body_points,
        reg_max=cfg.reg_max, reg_scale=cfg.reg_scale)
    out_j = tr.apply(
        {"params": variables["params"]["transformer"]},
        [jnp.asarray(f.permute(0, 2, 3, 1).numpy()) for f in efeats_t],
        train=False)
    np.testing.assert_allclose(np.asarray(out_j["pred_logits"]),
                               out_t["pred_logits"].numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["pred_keypoints"]),
                               out_t["pred_keypoints"].numpy(), rtol=1e-3, atol=1e-4)


def test_load_torch_checkpoint_zoo_layout(tmp_path):
    """Zoo .pth layout ({'model':…, 'ema': {'module':…}}) loads + converts."""
    from detrpose_tpu.utils.convert import load_torch_checkpoint

    torch.manual_seed(0)
    ref_model, cfg = build_reference_model("n", eval_hw=(128, 128))
    sd = ref_model.state_dict()
    path = str(tmp_path / "zoo.pth")
    torch.save({"model": sd, "ema": {"module": sd}, "epoch": 51}, path)

    loaded = load_torch_checkpoint(path, prefer_ema=True)
    assert "backbone.stem.stem1.conv.weight" in loaded

    model = build_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                           train=True))
    variables = convert_state_dict(loaded, dict(template))
    out = model.apply(variables, jnp.zeros((1, 128, 128, 3)), train=False)
    assert np.isfinite(np.asarray(out["pred_keypoints"])).all()


def test_pretrain_backbone_encoder_import():
    """Transfer-learning path: backbone+encoder weights load, decoder stays
    randomly initialized (reference: trainer.py:444-451)."""
    from detrpose_tpu.utils.convert import load_pretrained_backbone_encoder

    torch.manual_seed(0)
    ref_model, cfg = build_reference_model("n", eval_hw=(128, 128))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()
          if not k.startswith("transformer.")}

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                           train=True)
    old_dec = np.asarray(
        jax.tree.leaves(variables["params"]["transformer"])[0]).copy()
    new_vars = load_pretrained_backbone_encoder(sd, dict(variables))
    # backbone now matches torch
    tw = sd["backbone.stem.stem1.conv.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["backbone"]["stem"]["stem1"]["conv"]["kernel"]),
        tw, rtol=1e-6)
    # decoder untouched
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(new_vars["params"]["transformer"])[0]), old_dec)


@pytest.mark.slow
def test_converter_covers_x_size():
    """The structurally-different X config (hidden 384, B5 backbone) converts
    with every torch key consumed — guards zoo-checkpoint compatibility for
    all sizes without running a forward."""
    torch.manual_seed(0)
    ref_model, cfg = build_reference_model("x", eval_hw=(128, 128))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    model = build_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                           train=True))
    variables = convert_state_dict(sd, dict(template))  # raises on any mismatch
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))
    assert n > 70e6

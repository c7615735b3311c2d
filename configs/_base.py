"""Base experiment config (reference: configs/detrpose/include/detrpose_hgnetv2.py).

Per-size configs override the training schedule to match the reference zoo
recipes exactly (configs/detrpose/detrpose_hgnetv2_{n,s,m,l,x}[_crowdpose].py):
epochs, augmentation-policy epochs, multiscale collate stop epoch and repeat,
backbone LR, LR milestones, and gradient accumulation.
"""
model_size = "l"
num_body_points = 17

# Model-architecture overrides forwarded into detrpose_tpu.configs.model_config
# (e.g. {"dec_n_points": 8} — makes model hyperparameters config-addressable).
model_overrides = {}

training_params = {
    "output_dir": "output/detrpose_l",
    "epochs": 52,
    "total_batch_size": 16,
    "eval_batch_size": 32,
    "lr": 1e-4,
    "backbone_lr": 1e-5,
    "weight_decay": 1e-4,
    "clip_max_norm": 0.1,
    "milestones": [1000],
    "use_ema": True,
    "ema_decay": 0.9999,
    "ema_warmups": 2000,
    "warmup_steps": 0,
    # reference include/detrpose_hgnetv2.py:16 — L trains with grad accum 2
    "grad_accum_steps": 2,
    "base_size": 640,
    "base_size_repeat": 4,
    "multiscale_stop_epoch": 48,
    "policy_epochs": [5, 29, 48],
}

# Criterion losses + weights (reference include/detrpose_hgnetv2.py:86-99:
# Criterion(losses=['vfl','keypoints'], weight_dict=...)). Optional losses the
# config system can enable: "labels" (loss_ce), "mal" (loss_mal), "local"
# (loss_dfl) — all golden-tested vs the reference (test_criterion_golden.py).
losses = ["vfl", "keypoints"]
weight_dict = {"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0}

"""Base experiment config (reference: configs/detrpose/include/detrpose_hgnetv2.py)."""
model_size = "l"
num_body_points = 17

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
    "base_size": 640,
    "base_size_repeat": 4,
    "multiscale_stop_epoch": 48,
    "policy_epochs": [5, 29, 48],
}

weight_dict = {"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0}

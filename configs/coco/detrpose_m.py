import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_m.py
model_size = "m"
training_params["output_dir"] = "output/detrpose_m"
training_params["epochs"] = 64
training_params["backbone_lr"] = 1e-5
training_params["milestones"] = [15]
training_params["grad_accum_steps"] = 1
training_params["policy_epochs"] = [5, 35, 60]
training_params["base_size_repeat"] = 6
training_params["multiscale_stop_epoch"] = 60

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_s.py
model_size = "s"
training_params["output_dir"] = "output/detrpose_s"
training_params["epochs"] = 100
training_params["backbone_lr"] = 1e-4
training_params["grad_accum_steps"] = 1
training_params["policy_epochs"] = [5, 53, 96]
training_params["base_size_repeat"] = 20
training_params["multiscale_stop_epoch"] = 96

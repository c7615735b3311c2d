import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_m_crowdpose.py
model_size = "m"
num_body_points = 14
training_params["output_dir"] = "output/detrpose_m_crowdpose"
training_params["epochs"] = 76
training_params["backbone_lr"] = 1e-5
training_params["policy_epochs"] = [5, 41, 72]
training_params["base_size_repeat"] = 6
training_params["multiscale_stop_epoch"] = 72

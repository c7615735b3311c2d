import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_s_crowdpose.py
model_size = "s"
num_body_points = 14
training_params["output_dir"] = "output/detrpose_s_crowdpose"
training_params["epochs"] = 176
training_params["backbone_lr"] = 1e-5
training_params["policy_epochs"] = [5, 83, 156]
training_params["base_size_repeat"] = 20
training_params["multiscale_stop_epoch"] = 156

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_l_crowdpose.py
# (inherits the crowdpose base schedule include/dataset_crowdpose.py:27-47)
model_size = "l"
num_body_points = 14
training_params["output_dir"] = "output/detrpose_l_crowdpose"
training_params["epochs"] = 64
training_params["backbone_lr"] = 1e-5
training_params["policy_epochs"] = [5, 29, 60]
training_params["multiscale_stop_epoch"] = 60

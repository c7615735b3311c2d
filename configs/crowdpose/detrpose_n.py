import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_n_crowdpose.py
model_size = "n"
num_body_points = 14
training_params["output_dir"] = "output/detrpose_n_crowdpose"
training_params["epochs"] = 284
training_params["backbone_lr"] = 1e-5
training_params["policy_epochs"] = [5, 137, 264]
training_params["base_size_repeat"] = None
training_params["multiscale_stop_epoch"] = 264

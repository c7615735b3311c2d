import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_x.py
model_size = "x"
training_params["output_dir"] = "output/detrpose_x"
training_params["epochs"] = 52
training_params["backbone_lr"] = 5e-5
training_params["grad_accum_steps"] = 1

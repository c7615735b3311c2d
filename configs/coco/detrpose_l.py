import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
# reference: configs/detrpose/detrpose_hgnetv2_l.py (base schedule; grad_accum 2)
model_size = "l"
training_params["output_dir"] = "output/detrpose_l"
training_params["epochs"] = 52
training_params["backbone_lr"] = 1e-5

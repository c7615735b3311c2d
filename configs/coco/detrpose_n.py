import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
model_size = "n"
training_params["output_dir"] = "output/detrpose_n"
training_params["epochs"] = 160
training_params["backbone_lr"] = 0.0001

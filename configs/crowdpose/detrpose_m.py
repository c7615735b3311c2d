import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "_base.py")).read())
model_size = "m"
num_body_points = 14
training_params["output_dir"] = "output/detrpose_m_crowdpose"
training_params["epochs"] = 64
training_params["backbone_lr"] = 1e-05

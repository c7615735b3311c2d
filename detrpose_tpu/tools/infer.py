"""Visual inference CLI: image / video / folder -> skeleton overlays.

Reference semantics: tools/inference/torch_inf.py (640x640 resize, threshold
0.5, annotator overlay) and tools/inference/annotator.py (COCO skeleton).
One jitted XLA program covers preprocess -> model -> decode; frames of a video
reuse the compiled fixed-shape program (BASELINE config #4).

Usage:
  python -m detrpose_tpu.tools.infer --size l --ckpt ckpt.pth --input img.jpg
  python -m detrpose_tpu.tools.infer --size n --input video.mp4 --output out.mp4
"""
from __future__ import annotations

import argparse
import os

import numpy as np

COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]
CROWDPOSE_SKELETON = [
    (0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (0, 6), (1, 7), (6, 7),
    (6, 8), (7, 9), (8, 10), (9, 11), (12, 13), (0, 13), (1, 13),
]


def draw_poses(img: np.ndarray, kpts: np.ndarray, scores: np.ndarray,
               thresh: float = 0.5, num_body_points: int = 17) -> np.ndarray:
    import cv2

    skeleton = COCO_SKELETON if num_body_points == 17 else CROWDPOSE_SKELETON
    out = img.copy()
    for s, kp in zip(scores, kpts):
        if s < thresh:
            continue
        pts = kp[:, :2].astype(int)
        for a, b in skeleton:
            if a < len(pts) and b < len(pts):
                cv2.line(out, tuple(pts[a]), tuple(pts[b]), (60, 200, 60), 2)
        for p in pts:
            cv2.circle(out, tuple(p), 3, (40, 40, 230), -1)
        cv2.putText(out, f"{s:.2f}", tuple(pts[0]), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (255, 255, 255), 1)
    return out


def build_pipeline(size: str, num_body_points: int, ckpt: str | None,
                   res: int = 640, bf16: bool = True):
    import jax
    import jax.numpy as jnp

    from ..configs import model_config, build_model
    from ..models import postprocess

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    cfg = model_config(size, num_body_points=num_body_points, dtype=dtype)
    model = build_model(cfg)
    if ckpt and ckpt.endswith(".pth"):
        from ..utils.convert import convert_state_dict, load_torch_checkpoint

        sd = load_torch_checkpoint(ckpt)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, res, res, 3)), train=True))
        variables = convert_state_dict(sd, dict(template))
        variables = jax.tree.map(jnp.asarray, variables)
    elif ckpt:
        # natively-trained orbax checkpoint (output/best, output/checkpoint):
        # restore params + EMA without an optimizer (reference workflow:
        # torch_inf.py -r checkpoint.pth, prefers EMA)
        from ..utils.checkpoint import restore_variables

        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, res, res, 3)), train=True))
        variables = restore_variables(ckpt, dict(template))
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False))()

    @jax.jit
    def run(v, img_u8, orig_wh):
        # preprocess fused in-graph: uint8 HWC -> resized normalized batch
        x = img_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(x, (res, res, 3), method="bilinear")
        out = model.apply(v, x[None], train=False)
        return postprocess(out, orig_wh[None], num_body_points=num_body_points)

    return run, variables


def main():
    from ..utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="l", choices=["n", "s", "m", "l", "x"])
    p.add_argument("--num-body-points", type=int, default=17)
    p.add_argument("--ckpt", help="reference .pth checkpoint (converted on "
                   "load) or a natively-trained orbax checkpoint dir "
                   "(e.g. output/best; EMA weights preferred)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="inference_out")
    p.add_argument("--thresh", type=float, default=0.5)
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    run, variables = build_pipeline(args.size, args.num_body_points, args.ckpt)
    # --output may be a directory or a concrete file path (e.g. out.mp4,
    # matching the usage line above); a folder input always needs a directory
    out_is_file = args.output.lower().endswith(
        (".jpg", ".jpeg", ".png", ".mp4", ".avi", ".mov"))
    if out_is_file:
        parent = os.path.dirname(args.output)
        if parent:
            os.makedirs(parent, exist_ok=True)
    else:
        os.makedirs(args.output, exist_ok=True)

    def infer_image(path, out_path):
        img = np.asarray(Image.open(path).convert("RGB"))
        h, w = img.shape[:2]
        scores, labels, kpts = run(variables, jnp.asarray(img),
                                   jnp.asarray([w, h], jnp.float32))
        vis = draw_poses(img[:, :, ::-1],
                         np.asarray(kpts, np.float32)[0],
                         np.asarray(scores, np.float32)[0],
                         args.thresh, args.num_body_points)
        import cv2
        cv2.imwrite(out_path, vis)
        print(f"{path} -> {out_path} "
              f"({(np.asarray(scores, np.float32)[0] > args.thresh).sum()} poses)")

    def infer_video(path, out_path):
        import cv2

        cap = cv2.VideoCapture(path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        n = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = frame[:, :, ::-1]
            scores, labels, kpts = run(variables, jnp.asarray(rgb.copy()),
                                       jnp.asarray([w, h], jnp.float32))
            vw.write(draw_poses(frame,
                                np.asarray(kpts, np.float32)[0],
                                np.asarray(scores, np.float32)[0],
                                args.thresh, args.num_body_points))
            n += 1
        cap.release()
        vw.release()
        print(f"{path} -> {out_path} ({n} frames)")

    inp = args.input
    if os.path.isdir(inp):
        assert not out_is_file, "--output must be a directory for folder input"
        for f in sorted(os.listdir(inp)):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                infer_image(os.path.join(inp, f),
                            os.path.join(args.output, f))
    elif inp.lower().endswith((".mp4", ".avi", ".mov")):
        infer_video(inp, args.output if out_is_file
                    else os.path.join(args.output, "out.mp4"))
    else:
        infer_image(inp, args.output if out_is_file
                    else os.path.join(args.output, os.path.basename(inp)))


if __name__ == "__main__":
    main()

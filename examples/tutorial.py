"""End-to-end DETRPose-TPU tutorial — the reference's DETRPose_tutorial.ipynb
(install -> model -> inference -> visualization) as a runnable script.

Walks the whole user journey in five steps:
  1. build a model from a size config,
  2. get weights (random init here; a converted zoo .pth or a natively
     trained orbax checkpoint both plug into the same line),
  3. jit one serve function (preprocess + forward + postprocess in-graph),
  4. run it on a real image,
  5. draw the predicted poses and save the overlay.

Run on the TPU (default) or on CPU with a small size/resolution:

  python examples/tutorial.py                       # TPU, DETRPose-L
  python examples/tutorial.py --size n --res 160 --cpu   # quick CPU smoke

With weights: --ckpt detrpose_l.pth (converted zoo checkpoint) or
--ckpt output/best (your own training run).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="l", choices=list("nsmlx"))
    ap.add_argument("--res", type=int, default=640)
    ap.add_argument("--ckpt", default=None,
                    help=".pth zoo checkpoint or orbax dir (default: random init)")
    ap.add_argument("--image", default="/root/reference/examples/example1.jpg")
    ap.add_argument("--output", default="/tmp/tutorial_out.jpg")
    ap.add_argument("--thresh", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (use with --size n --res 160)")
    args = ap.parse_args()

    # ---- step 0: backend. On this sandbox the axon TPU platform registers
    # itself regardless of JAX_PLATFORMS; forcing CPU needs the config API.
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}")

    import numpy as np
    from PIL import Image

    # ---- steps 1-3: model + weights + jitted serve function. build_pipeline
    # is exactly what the inference CLI uses (tools/infer.py) — the tutorial
    # and the production path are the same code.
    from detrpose_tpu.tools.infer import build_pipeline, draw_poses

    t0 = time.time()
    run, variables = build_pipeline(args.size, num_body_points=17,
                                    ckpt=args.ckpt, res=args.res,
                                    bf16=not args.cpu)
    print(f"model ready in {time.time() - t0:.1f}s "
          f"({'random init' if not args.ckpt else args.ckpt})")

    # ---- step 4: inference on a real image. The serve function takes the
    # raw uint8 image; resize + normalize + forward + decode are all inside
    # one XLA program (first call compiles, ~20-40s on TPU).
    import jax.numpy as jnp

    if not os.path.exists(args.image):
        # Default demo asset is sandbox-specific; synthesize a stand-in so
        # the tutorial runs anywhere (poses on random init are arbitrary
        # either way — the point is driving the pipeline end to end).
        print(f"{args.image} not found; synthesizing a demo image")
        rng = np.random.default_rng(0)
        args.image = "/tmp/tutorial_demo.jpg"
        Image.fromarray(rng.integers(0, 255, (480, 640, 3), np.uint8),
                        "RGB").save(args.image)
    img = Image.open(args.image).convert("RGB")
    w, h = img.size
    t0 = time.time()
    scores, labels, kpts = run(variables, jnp.asarray(np.asarray(img, np.uint8)),
                               jnp.asarray([w, h], jnp.float32))
    jax.block_until_ready(scores)
    print(f"first call (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    scores, labels, kpts = run(variables, jnp.asarray(np.asarray(img, np.uint8)),
                               jnp.asarray([w, h], jnp.float32))
    jax.block_until_ready(scores)
    print(f"steady-state latency: {(time.time() - t0) * 1000:.1f} ms")

    scores, kpts = np.asarray(scores)[0], np.asarray(kpts)[0]
    n_above = int((scores > args.thresh).sum())
    print(f"top score {scores.max():.3f}; {n_above} poses above {args.thresh}")

    # ---- step 5: visualize. With random weights the overlay is noise —
    # load a checkpoint for meaningful poses (README 'Switching from the
    # PyTorch reference' maps every zoo workflow).
    overlay = draw_poses(np.asarray(img)[:, :, ::-1], kpts, scores,
                         thresh=args.thresh)
    try:
        import cv2

        cv2.imwrite(args.output, overlay)
        print(f"overlay written to {args.output}")
    except ImportError:
        Image.fromarray(overlay[:, :, ::-1]).save(args.output)
        print(f"overlay written to {args.output} (PIL)")


if __name__ == "__main__":
    main()

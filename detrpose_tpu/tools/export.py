"""Deployment export: serialize the jitted JPEG->poses program via jax.export.

Replaces the reference's ONNX/TensorRT path (tools/deployment/export_onnx.py,
export_tensorrt.py): on TPU the deployment artifact IS the compiled XLA
program. `jax.export` serializes the StableHLO module + params so a serving
process can load and run it without the model-building code; re-param fusion
(utils/deploy.fuse_for_deploy) is applied first, mirroring model.deploy()
(reference: src/models/detrpose/detrpose.py:69-74).

Usage:
  python -m detrpose_tpu.tools.export --size l --ckpt ckpt.pth \
      --batch 32 --out exported/detrpose_l
"""
from __future__ import annotations

import argparse
import os
import pickle


def export_model(size: str, num_body_points: int = 17, ckpt: str | None = None,
                 batch: int = 32, res: int = 640, bf16: bool = True,
                 fuse: bool = True, out_dir: str = "exported"):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..configs import model_config, build_model
    from ..models import postprocess
    from ..utils.deploy import fuse_for_deploy

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    cfg = model_config(size, num_body_points=num_body_points, dtype=dtype)

    if ckpt and ckpt.endswith(".pth"):
        from ..utils.convert import convert_state_dict, load_torch_checkpoint

        base_model = build_model(cfg)
        sd = load_torch_checkpoint(ckpt)
        template = jax.eval_shape(
            lambda: base_model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, res, res, 3)), train=True))
        variables = convert_state_dict(sd, dict(template))
    elif ckpt:
        # natively-trained orbax checkpoint (output/best) — params + EMA only
        from ..utils.checkpoint import restore_variables

        base_model = build_model(cfg)
        template = jax.eval_shape(
            lambda: base_model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, res, res, 3)), train=True))
        variables = jax.device_get(restore_variables(ckpt, dict(template)))
    else:
        base_model = build_model(cfg)
        variables = jax.jit(lambda: base_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False))()
        variables = jax.device_get(variables)

    if fuse:
        model = build_model(cfg, deploy=True)
        variables = fuse_for_deploy(variables)
    else:
        model = base_model
    variables = jax.tree.map(jnp.asarray, variables)

    def serve(v, images, orig_sizes):
        """(B, res, res, 3) float32 [0,1] -> (scores, labels, keypoints)."""
        out = model.apply(v, images, train=False)
        return postprocess(out, orig_sizes, num_body_points=num_body_points)

    x = jax.ShapeDtypeStruct((batch, res, res, 3), jnp.float32)
    ts = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    exported = jexport.export(jax.jit(serve))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        x, ts)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "program.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(out_dir, "params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    meta = dict(size=size, num_body_points=num_body_points, batch=batch,
                res=res, bf16=bf16, fused=fuse)
    with open(os.path.join(out_dir, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f)
    print(f"exported {size} (batch {batch}, {res}px, bf16={bf16}, fused={fuse}) "
          f"-> {out_dir}")
    return out_dir


def load_exported(out_dir: str):
    """Load a serialized program + params; returns callable(images, sizes)."""
    import jax
    from jax import export as jexport

    with open(os.path.join(out_dir, "program.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(out_dir, "params.pkl"), "rb") as f:
        variables = pickle.load(f)

    def run(images, orig_sizes):
        return exported.call(variables, images, orig_sizes)

    return run


def main():
    from ..utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="l", choices=["n", "s", "m", "l", "x"])
    p.add_argument("--num-body-points", type=int, default=17)
    p.add_argument("--ckpt")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--res", type=int, default=640)
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--out", default="exported/detrpose")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and run one batch")
    args = p.parse_args()
    out = export_model(args.size, args.num_body_points, args.ckpt, args.batch,
                       args.res, not args.no_bf16, not args.no_fuse, args.out)
    if args.check:
        import jax.numpy as jnp

        run = load_exported(out)
        x = jnp.zeros((args.batch, args.res, args.res, 3), jnp.float32)
        ts = jnp.full((args.batch, 2), float(args.res), jnp.float32)
        scores, labels, kpts = run(x, ts)
        print(f"check OK: scores {scores.shape}, keypoints {kpts.shape}")


if __name__ == "__main__":
    main()

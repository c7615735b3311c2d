"""Benchmark + model-info tools.

Replicates the reference benchmark suite on TPU:
  * get_info (tools/benchmark/get_info.py): params + FLOPs at (1, 640, 640, 3),
    from XLA's compiled cost analysis instead of calflops.
  * latency protocol (tools/benchmark/torch_benchmark.py:34-51): warmup, many
    iterations, report the average of the fastest segment; plus batched
    throughput (the TPU serving configuration).

Usage:
  python -m detrpose_tpu.tools.benchmark --sizes n s m l x --batch 1 32
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def model_info(size: str, num_body_points: int = 17, res: int = 640):
    import jax
    import jax.numpy as jnp

    from ..configs import model_config, build_model

    cfg = model_config(size, num_body_points=num_body_points)
    model = build_model(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
                           train=False))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    lowered = fwd.lower(
        jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), dict(shapes)),
        jax.ShapeDtypeStruct((1, res, res, 3), jnp.float32))
    try:
        ca = lowered.compile().cost_analysis()
        gflops = ca.get("flops", float("nan")) / 1e9
    except Exception:
        gflops = float("nan")
    return {"size": size, "params_M": round(n_params / 1e6, 2),
            "gflops_640": round(gflops, 1)}


def bench_size(size: str, batch: int, res: int = 640, bf16: bool = True,
               warmup: int = 10, iters: int = 50, num_body_points: int = 17):
    import jax
    import jax.numpy as jnp

    from ..configs import model_config, build_model
    from ..models import postprocess

    cfg = model_config(size, num_body_points=num_body_points,
                       dtype=jnp.bfloat16 if bf16 else jnp.float32)
    model = build_model(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False))()
    jax.block_until_ready(variables)

    @jax.jit
    def fwd(v, x, ts):
        return postprocess(model.apply(v, x, train=False), ts,
                           num_body_points=num_body_points)

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.uniform(0, 1, (batch, res, res, 3)).astype(np.float32))
          for _ in range(4)]
    ts = jnp.full((batch, 2), float(res), jnp.float32)
    out = fwd(variables, xs[0], ts)
    jax.block_until_ready(out)
    for i in range(warmup):
        out = fwd(variables, xs[i % 4], ts)
    jax.block_until_ready(out)

    # PRIMARY: execution-proven scan slope (utils/measure.py) — immune to
    # runtimes where block_until_ready does not bound execution (this
    # sandbox's axon tunnel; VERDICT r4). Kept alongside: the classic
    # block-wall protocol as a diagnostic; agreement means the runtime's
    # sync primitives are honest that day.
    from ..utils.measure import forward_slope

    slope_s, _fixed, _detail = forward_slope(
        lambda v, x, t: fwd(v, x, t), variables, xs[0], ts,
        ns=(2, 2 + max(8, iters // 2)))

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fwd(variables, xs[i % 4], ts)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(sorted(times))
    wall_ms = float(np.median(times)) * 1000
    return {
        "size": size, "batch": batch, "res": res, "bf16": bf16,
        "latency_ms": round(slope_s * 1000, 3),
        "images_per_sec": round(batch / slope_s, 1),
        "basis": "scan_slope",
        "dispatch_wall_ms": round(wall_ms, 3),
        "dispatch_wall_agrees": bool(0.5 <= wall_ms / (slope_s * 1000) <= 2.0),
    }


def _preprocess_image(img, res: int = 640):
    """The reference latency-protocol preprocessing
    (tools/benchmark/dataset.py:46-83): Resize(size=639, max_size=640)
    (torchvision semantics: shorter side -> 639 unless the longer side would
    exceed 640, then longer side -> 640), pad right/bottom to 640x640 with
    fill 114, scale to [0, 1] float."""
    from PIL import Image

    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    new_short = res - 1
    new_long = int(new_short * long / short)
    if new_long > res:
        new_short, new_long = int(res * new_short / new_long), res
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    resized = img.resize((nw, nh), Image.BILINEAR)
    canvas = np.full((res, res, 3), 114, np.uint8)
    canvas[:nh, :nw] = np.asarray(resized, np.uint8)
    return canvas.astype(np.float32) / 255.0, (w, h)


def bench_data(size: str, img_dir: str | None, batch: int = 1, res: int = 640,
               bf16: bool = True, warmup: int = 40, num_images: int = 200,
               num_body_points: int = 17):
    """Latency over REAL images with the reference's preprocessing
    (tools/benchmark/torch_benchmark.py:29-100: warmup, run every image,
    report the average of the fastest segment). When no --data dir is given,
    synthesizes JPEGs of varied sizes so the protocol (decode -> resize-639 ->
    pad-114 -> H2D -> model) is still exercised end to end."""
    import glob
    import os
    import tempfile

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..configs import model_config, build_model
    from ..models import postprocess

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    if img_dir:
        paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir)
                       if f.lower().endswith(exts))
        if not paths:
            raise SystemExit(
                f"--data {img_dir}: no images found (looked for {exts}); "
                "refusing to silently benchmark synthetic data")
    else:
        tmp = tempfile.mkdtemp(prefix="bench_jpegs_")
        rng = np.random.default_rng(0)
        for i in range(num_images):
            w, h = int(rng.integers(320, 641)), int(rng.integers(240, 481))
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3), np.uint8), "RGB"
            ).save(os.path.join(tmp, f"{i:06d}.jpg"), quality=90)
        img_dir = tmp
        paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
    paths = paths[:num_images]

    cfg = model_config(size, num_body_points=num_body_points,
                       dtype=jnp.bfloat16 if bf16 else jnp.float32)
    model = build_model(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False))()
    jax.block_until_ready(variables)

    @jax.jit
    def fwd(v, x, ts):
        return postprocess(model.apply(v, x, train=False), ts,
                           num_body_points=num_body_points)

    # preprocess all images host-side once (the reference dataset does decode +
    # preprocess per item; here the timed loop includes H2D + model + decode
    # of results, the reference's model.forward-only timing plus transfer)
    pre = [_preprocess_image(Image.open(p).convert("RGB"), res) for p in paths]
    if len(pre) < batch:
        # fewer images than one batch: cycle them (the timing protocol needs
        # full batches; reference runs 1000 images at batch 1)
        pre = (pre * ((batch + len(pre) - 1) // len(pre)))[:batch]
    batches = []
    for i in range(0, len(pre) - batch + 1, batch):
        chunk = pre[i:i + batch]
        batches.append((
            np.stack([c[0] for c in chunk]),
            np.asarray([c[1] for c in chunk], np.float32),
        ))

    x0 = jnp.asarray(batches[0][0])
    t0 = jnp.asarray(batches[0][1])
    out = fwd(variables, x0, t0)
    jax.block_until_ready(out)
    for i in range(warmup):
        out = fwd(variables, x0, t0)
    jax.block_until_ready(out)

    # Per-batch walls use block_until_ready (the reference's cuda-sync
    # protocol); a device-side accumulator + ONE final scalar read proves all
    # batches actually executed, and the aggregate wall-to-read is reported
    # as the execution-proven number (on runtimes where block_until_ready is
    # honest the two agree).
    @jax.jit
    def fwd_acc(v, x, ts, acc):
        scores, labels, kpts = fwd(v, x, ts)
        return acc + jnp.sum(scores).astype(jnp.float32)

    acc = jnp.float32(0.0)
    times = []
    t_all0 = time.perf_counter()
    for x_np, ts_np in batches:
        t_start = time.perf_counter()
        acc = fwd_acc(variables, jnp.asarray(x_np), jnp.asarray(ts_np), acc)
        jax.block_until_ready(acc)
        times.append(time.perf_counter() - t_start)
    _ = float(acc)  # execution-proving read
    proven_ms = (time.perf_counter() - t_all0) / len(batches) * 1000
    times = np.asarray(sorted(times))
    fastest = times[: max(1, len(times) // 10)].mean()
    return {
        "size": size, "batch": batch, "res": res, "mode": "data",
        "images": len(batches) * batch, "img_dir": img_dir,
        "latency_ms": round(proven_ms, 3),
        "basis": "executed_wall_incl_h2d",
        "per_batch_wall_ms": round(float(np.median(times)) * 1000, 3),
        "fastest_ms": round(float(fastest) * 1000, 3),
        "images_per_sec": round(batch / (proven_ms / 1000), 1),
    }


def bench_train_step(size: str, batch: int = 8, res: int = 640,
                     num_body_points: int = 17, iters: int = 10,
                     remat: bool = False):
    """Full training-step throughput (fwd + criterion + backward + AdamW + EMA)."""
    import jax
    import jax.numpy as jnp

    from ..configs import model_config, build_model
    from ..parallel import make_train_step, init_train_state
    from ..train.optim import make_optimizer
    from ..train.cdn import build_cdn

    K, G = num_body_points, 8
    cfg = model_config(size, num_body_points=K, dtype=jnp.bfloat16, remat=remat)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    kxy = rng.uniform(0.2, 0.8, (batch, G, K, 2)).astype(np.float32)
    targets = {
        "labels": np.zeros((batch, G), np.int32),
        "boxes": np.concatenate(
            [kxy.mean(2), np.full((batch, G, 2), 0.2, np.float32)], -1),
        "keypoints": np.concatenate(
            [kxy.reshape(batch, G, 2 * K), np.ones((batch, G, K), np.float32)], -1),
        "area": np.full((batch, G), 0.04, np.float32),
        "valid": np.ones((batch, G), bool),
    }
    dn_np = build_cdn(targets, cfg.num_queries, K, (res, res), rng)
    dn = {k: (jax.tree.map(jnp.asarray, v) if k not in ("pad_size", "num_dn_group")
              else v) for k, v in dn_np.items()}
    tx = make_optimizer(jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=True))["params"])
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, 128, 128, 3)))
    step = jax.jit(make_train_step(model, tx, num_body_points=K,
                                   num_classes=cfg.num_classes))
    batch_d = {
        "images": jnp.asarray(rng.uniform(0, 1, (batch, res, res, 3)).astype(np.float32)),
        "targets": jax.tree.map(jnp.asarray, targets),
        "dn": dn,
    }
    state, m = step(state, batch_d)
    jax.block_until_ready(m)

    # PRIMARY: execution-proven scan slope with the train state itself as
    # the carry (each step's params depend on the previous update). The
    # block-wall loop stays as a sync-honesty diagnostic.
    from ..utils.measure import train_step_slope

    slope_s, _fixed, _detail = train_step_slope(
        step, state, batch_d, ns=(2, 2 + max(8, iters)))

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_d)
    jax.block_until_ready(m)
    wall_ms = (time.perf_counter() - t0) / iters * 1000
    return {
        "size": size, "batch": batch, "res": res, "mode": "train",
        "remat": remat,
        "step_ms": round(slope_s * 1000, 2),
        "images_per_sec": round(batch / slope_s, 1),
        "basis": "scan_slope",
        "dispatch_wall_ms": round(wall_ms, 2),
        "dispatch_wall_agrees": bool(0.5 <= wall_ms / (slope_s * 1000) <= 2.0),
        "loss": round(float(m["loss_total"]), 3),
    }


def main():
    from ..utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", nargs="+", default=["n", "s", "m", "l", "x"],
                   choices=["n", "s", "m", "l", "x"])
    p.add_argument("--batch", nargs="+", type=int, default=[1, 32])
    p.add_argument("--res", type=int, default=640)
    p.add_argument("--info-only", action="store_true")
    p.add_argument("--train", action="store_true",
                   help="benchmark the full training step instead of inference")
    p.add_argument("--data", nargs="?", const="", default=None, metavar="DIR",
                   help="real-image leg: reference preprocessing "
                        "(resize-639/max-640 + pad-114) over DIR/*.jpg; with "
                        "no DIR, synthetic JPEGs are generated")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    for size in args.sizes:
        if args.data is not None:
            for b in args.batch:
                print(json.dumps(bench_data(size, args.data or None, b,
                                            args.res)))
            continue
        if args.train:
            for b in args.batch:
                print(json.dumps(bench_train_step(size, b, args.res,
                                                  iters=max(5, args.iters // 5),
                                                  remat=args.remat)))
            continue
        print(json.dumps(model_info(size, res=args.res)))
        if args.info_only:
            continue
        for b in args.batch:
            print(json.dumps(bench_size(size, b, args.res, iters=args.iters)))


if __name__ == "__main__":
    main()

"""Execution-proven DETRPose forward timing via on-device scan slope.

Runs N forward+postprocess iterations inside ONE jitted executable
(lax.scan, data dependency threaded through the carry so iterations cannot
be elided or reordered), reduces to a scalar on device, reads the 4-byte
scalar on the host. slope = (t(N2) - t(N1)) / (N2 - N1) cancels all fixed
costs (dispatch, tunnel RPC latency, read path). Control experiment
(tools_local_runtime_probe.py matmul) measured 174.5 TFLOP/s = 88.5% of
v5e bf16 peak with this method — physically sane, unlike the historical
block_until_ready walls (VERDICT r4 weak #1).

Usage: python tools_local_model_slope.py [size] [batch] [res]
"""
import json
import os
import sys
import time

import numpy as np


def main():
    from detrpose_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from detrpose_tpu.configs import model_config, build_model
    from detrpose_tpu.models import postprocess

    size = sys.argv[1] if len(sys.argv) > 1 else "l"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    cfg = model_config(size, dtype=jnp.bfloat16)
    model = build_model(cfg)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False)
    )()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, res, res, 3)).astype(np.float32))
    ts = jnp.full((batch, 2), float(res), jnp.float32)

    def fwd(v, img, sizes):
        out = model.apply(v, img, train=False)
        return postprocess(out, sizes, num_body_points=cfg.num_body_points)

    # analytical FLOPs of one forward+postprocess batch
    flops_batch = None
    try:
        ca = jax.jit(fwd).lower(variables, x, ts).compile().cost_analysis()
        if ca:
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops_batch = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    def make(n):
        @jax.jit
        def run(v, img, sizes):
            def body(carry, _):
                xi = img + (carry * 1e-12).astype(img.dtype)
                scores, labels, kpts = fwd(v, xi, sizes)
                return jnp.sum(scores).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return run

    results = {}
    for n in (2, 34):
        run = make(n)
        t0 = time.time()
        v = float(run(variables, x, ts))
        first = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time()
            v = float(run(variables, x, ts))
            walls.append(time.time() - t0)
        results[n] = {"first_s": first, "walls": walls, "min_wall": min(walls),
                      "value": v}
        print(f"# n={n} first={first:.2f}s walls={['%.3f' % w for w in walls]}",
              file=sys.stderr)

    n1, n2 = 2, 34
    slope_s = (results[n2]["min_wall"] - results[n1]["min_wall"]) / (n2 - n1)
    ms_batch = slope_s * 1e3
    ips = batch / slope_s
    tflops = flops_batch / slope_s / 1e12 if flops_batch else None
    print(json.dumps({
        "probe": "model_scan_slope", "size": size, "batch": batch, "res": res,
        "ms_per_batch": ms_batch, "images_per_sec": ips,
        "gflops_per_batch": flops_batch and flops_batch / 1e9,
        "tflops": tflops,
        "mfu_vs_197": tflops and tflops / 197.0,
        "vs_trt_l_baseline": ips / (1000.0 / 9.50),
        "fixed_overhead_s": results[n1]["min_wall"] - n1 * slope_s,
        "detail": results,
    }))


if __name__ == "__main__":
    main()

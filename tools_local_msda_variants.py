"""A/B the MSDA sampler variants on real TPU with execution-proven timing.

BENCH r5 located ~92% of the DETRPose-L forward in the MSDA gather
(tools/pallas_bench.py: 168.7 ms/call at L eval shapes vs a ~2-4 ms
bandwidth roofline). This tool slope-times every sampler variant at those
shapes so the default is a measurement, not an assumption:

  corner      4 gathers/level of 64 B rows   (historical default)
  patch       1 gather/level of 256 B rows   (4-corner patch table)
  allheads    4 gathers/level of 512 B rows  (all heads per row, slice after)
  + MSDA_ONEHOT_MAX_HW variants (one-hot MXU path for the small levels)

Usage: python tools_local_msda_variants.py [batch] [res]
"""
import json
import os
import sys

import numpy as np


def main():
    from detrpose_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import detrpose_tpu.ops.ms_deform_attn  # noqa: F401
    M = sys.modules["detrpose_tpu.ops.ms_deform_attn"]
    from detrpose_tpu.utils.measure import slope_timer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    nH, nP, dh = 8, 4, 32
    Lq = 60 * 18
    s = res // 8
    shapes = [(s, s), (s // 2, s // 2), (s // 4, s // 4)]
    nL = len(shapes)

    rng = np.random.default_rng(0)
    value_levels = [
        jnp.asarray(rng.normal(size=(B, H, W, nH, dh)), jnp.bfloat16)
        for H, W in shapes
    ]
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, nH, nL, nP, 2)), jnp.float32)
    aw = rng.random((B, Lq, nH, nL, nP)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(-1, -2), keepdims=True))

    def log(m):
        print(m, file=sys.stderr, flush=True)

    results = {}

    def bench(name, env):
        for k, v in env.items():
            os.environ[k] = v

        def make(n):
            @jax.jit
            def run(vals, l0, w0):
                def body(carry, _):
                    li = l0 + (carry * 1e-12).astype(l0.dtype)
                    out = M.ms_deform_attn(vals, li, w0)
                    return jnp.sum(out).astype(jnp.float32), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return lambda: run(value_levels, loc, aw)

        try:
            slope_s, _fx, _d = slope_timer(make, ns=(2, 18), repeats=2, log=log)
            ms = slope_s * 1e3
        except Exception as e:  # OOM etc. — record, keep going
            ms = None
            log(f"# {name} failed: {type(e).__name__}: {e}")
        results[name] = ms
        print(f"{name:>40}: "
              f"{'FAILED' if ms is None else '%8.3f ms/call' % ms}",
              flush=True)
        for k in env:
            os.environ.pop(k, None)
        return ms

    bench("corner (default)", {"MSDA_LEVEL_SAMPLER": "corner",
                               "MSDA_ONEHOT_MAX_HW": "256"})
    bench("patch", {"MSDA_LEVEL_SAMPLER": "patch",
                    "MSDA_ONEHOT_MAX_HW": "256"})
    bench("allheads", {"MSDA_LEVEL_SAMPLER": "allheads",
                       "MSDA_ONEHOT_MAX_HW": "256"})
    bench("allheads + onehot<=400", {"MSDA_LEVEL_SAMPLER": "allheads",
                                     "MSDA_ONEHOT_MAX_HW": "400"})
    bench("corner + onehot<=400", {"MSDA_LEVEL_SAMPLER": "corner",
                                   "MSDA_ONEHOT_MAX_HW": "400"})
    print(json.dumps({k: (v if v is None else round(v, 3))
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()

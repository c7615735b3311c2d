"""utils/measure.py: the execution-proven scan-slope timer.

The slope must (a) be positive and finite, (b) scale with the workload,
(c) produce a value that actually depends on every scan iteration (the
execution-proving property — checked via the returned carry value).
"""
import numpy as np

import jax
import jax.numpy as jnp

from detrpose_tpu.utils.measure import slope_timer, forward_slope


def test_slope_timer_measures_iteration_cost():
    dim = 128

    def make(n):
        @jax.jit
        def run(a, b):
            def body(c, _):
                return (c @ b) * (1.0 / dim), ()
            c, _ = jax.lax.scan(body, a, None, length=n)
            return c.sum()
        a = jnp.ones((dim, dim), jnp.float32)
        b = jnp.eye(dim, dtype=jnp.float32) * 1.001
        return lambda: run(a, b)

    slope_s, fixed_s, detail = slope_timer(make, ns=(2, 66), repeats=2)
    assert np.isfinite(slope_s) and slope_s >= 0
    # the returned value depends on n: (1.001/128 * 128)^n * 128 differs
    v1, v2 = detail[2]["value"], detail[66]["value"]
    assert v1 != v2, "carry value must depend on the number of iterations"
    # detail carries the timing walls for auditability
    assert detail[2]["walls_s"] and detail[66]["walls_s"]


def test_forward_slope_threads_input_dependency():
    calls = {"n": 0}

    def fwd(v, x, ts):
        # a stand-in model: output depends on x so the carry perturbation
        # (x + carry*1e-12) chains iterations
        return (jnp.tanh(x @ v).sum(axis=-1),)

    v = jnp.ones((8, 8), jnp.float32) * 0.1
    x = jnp.ones((2, 8), jnp.float32)
    ts = jnp.ones((2, 2), jnp.float32)
    slope_s, fixed_s, detail = forward_slope(fwd, v, x, ts, ns=(2, 10),
                                             repeats=2)
    assert np.isfinite(slope_s)
    assert np.isfinite(detail[2]["value"])

"""Execution-proven timing primitives (scan slope).

Why this exists: on some runtimes (this sandbox's tunneled axon TPU being
the motivating case) host-side sync primitives cannot be trusted —
``jax.block_until_ready`` has been observed to return without bounding
execution, so wall-clock around dispatched calls measures dispatch rate, not
compute, and ``jax.profiler.start_trace`` hangs. The one thing that cannot
lie is data dependence: if a 4-byte scalar read on the host *succeeds*, every
on-device operation it depends on has executed.

``slope_timer`` therefore times N iterations of the workload inside ONE
jitted executable (``lax.scan`` with the carry threaded through every
iteration so nothing can be elided, CSE'd, or reordered), reads the scalar
result, and differences two N values: ``slope = (t2 - t1) / (N2 - N1)``
cancels every fixed cost — dispatch, RPC latency, the read path, cache
lookups. Validated against a chained 8192^3 bf16 matmul control: 174.5
TFLOP/s = 88.5% of v5e peak (a block_until_ready wall on the same day's
runtime agreed; on bad days it reads thousands of times too fast).

Callers MUST pass device trees (params, batch) as *arguments* to the scanned
function, never close over them: a jitted fn that captures hundreds of small
arrays re-uploads them as constants every call through the tunnel
(measured +0.5 s/call on a 4 ms forward).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Sequence, Tuple


def slope_timer(
    make_run: Callable[[int], Callable[[], object]],
    ns: Sequence[int] = (2, 34),
    repeats: int = 3,
    log: Callable[[str], None] = None,
) -> Tuple[float, float, Dict]:
    """Time ``make_run(n)()`` at each scan length; slope across lengths.

    make_run(n) must return a zero-arg callable whose result is a device
    scalar computed by n data-dependent iterations of the workload;
    ``float()`` of it is the execution-proving read.

    Returns (seconds_per_iter, fixed_overhead_seconds, detail_dict).
    """
    detail = {}
    for n in ns:
        run = make_run(n)
        t0 = time.time()
        v = float(run())
        first = time.time() - t0
        walls = []
        for _ in range(repeats):
            t0 = time.time()
            v = float(run())
            walls.append(time.time() - t0)
        detail[n] = {"first_s": round(first, 3),
                     "walls_s": [round(w, 4) for w in walls],
                     "value": v}
        if log:
            log(f"# scan n={n} first={first:.2f}s "
                f"walls={['%.3f' % w for w in walls]}")
    n1, n2 = ns[0], ns[-1]
    t1 = min(detail[n1]["walls_s"])
    t2 = min(detail[n2]["walls_s"])
    slope_s = (t2 - t1) / (n2 - n1)
    fixed_s = t1 - n1 * slope_s
    return slope_s, fixed_s, detail


def forward_slope(fwd, variables, x, ts, ns=(2, 34), repeats=3, log=None):
    """Execution-proven seconds/batch of ``fwd(variables, x, ts) ->
    (scores, ...)``. The carry (a scalar reduction of the scores) perturbs
    the next iteration's input, so iterations are sequentially dependent.
    """
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(v, img, sizes):
            def body(carry, _):
                xi = img + (carry * 1e-12).astype(img.dtype)
                out = fwd(v, xi, sizes)
                first = jax.tree.leaves(out)[0]
                return jnp.sum(first).astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c
        return lambda: run(variables, x, ts)

    return slope_timer(make, ns, repeats, log)


def train_step_slope(step, state, batch, ns=(2, 18), repeats=3, log=None):
    """Execution-proven seconds/step of ``step(state, batch) -> (state,
    metrics)``. The train state itself is the scan carry — each iteration's
    parameters depend on the previous update, the strongest possible chain.
    The returned scalar sums one parameter leaf of the final state.
    """
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(s0, b):
            def body(s, _):
                s, _m = step(s, b)
                return s, ()
            s, _ = jax.lax.scan(body, s0, None, length=n)
            leaf = jax.tree.leaves(s.params)[0]
            return jnp.sum(leaf).astype(jnp.float32)
        return lambda: run(state, batch)

    return slope_timer(make, ns, repeats, log)

"""Ablate the separable MSDA kernel's stages on TPU to locate its cost.

Variants (same grid/IO, stages dropped — NOT semantically valid, timing only):
  full        R build + stage1 matmul + Cexp build/mult + Sel matmul
  no_cexp     skip the Cexp hat build/multiply (stage2 matmul on raw T)
  stage1_only skip stage2 entirely (out = T[:, :dh])
  io_only     skip all compute (out = V[:TP? ...] passthrough-ish)

Also sweeps the point-tile size TP. Usage:
  python tools_local_msda_ablate.py [batch] [res]
"""
import functools
import json
import sys

import numpy as np


def main():
    from detrpose_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from detrpose_tpu.utils.measure import slope_timer

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    nH, nP, dh, Lq = 8, 4, 32, 1080
    s = res // 8
    level_shapes = [(s, s), (s // 2, s // 2), (s // 4, s // 4)]
    nL = 3

    rng = np.random.default_rng(0)
    value_levels = [
        jnp.asarray(rng.normal(size=(B, H, W, nH, dh)), jnp.bfloat16)
        for H, W in level_shapes
    ]
    loc = jnp.asarray(rng.uniform(0, 1, (B, Lq, nH, nL, nP, 2)), jnp.float32)
    aw = rng.random((B, Lq, nH, nL, nP)).astype(np.float32)
    aw = jnp.asarray(aw / aw.sum(axis=(-1, -2), keepdims=True))

    def log(m):
        print(m, file=sys.stderr, flush=True)

    def build(mode, TP):
        def kern(ix_refs, iy_refs, aw_refs, v_refs, sel_refs, o_ref):
            acc = None
            for lvl, (H, W) in enumerate(level_shapes):
                ix = ix_refs[lvl][0, 0].reshape(TP, 1)
                iy = iy_refs[lvl][0, 0].reshape(TP, 1)
                a = aw_refs[lvl][0, 0].reshape(TP, 1)
                if mode == "io_only":
                    part = (v_refs[lvl][0, 0, :1, :dh] * 0
                            + ix[:, :1]).astype(jnp.float32) * jnp.ones(
                                (TP, dh), jnp.float32)
                    acc = part if acc is None else acc + part
                    continue
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (TP, H), 1).astype(jnp.float32)
                R = ((jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0)) * a
                     ).astype(jnp.bfloat16)
                T = jnp.dot(R, v_refs[lvl][0, 0],
                            preferred_element_type=jnp.float32)
                if mode == "stage1_only":
                    part = T[:, :dh]
                elif mode == "no_cexp":
                    part = jnp.dot(T.astype(jnp.bfloat16), sel_refs[lvl][:],
                                   preferred_element_type=jnp.float32)
                else:
                    cols = (jax.lax.broadcasted_iota(
                        jnp.int32, (TP, W * dh), 1) // dh).astype(jnp.float32)
                    Cexp = jnp.maximum(1.0 - jnp.abs(ix - cols), 0.0)
                    part = jnp.dot((T * Cexp).astype(jnp.bfloat16),
                                   sel_refs[lvl][:],
                                   preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            o_ref[0, 0] = acc

        P = Lq * nP
        n_t = -(-P // TP)
        P_pad = n_t * TP

        ixs, iys, aws_, vls, sels = [], [], [], [], []
        for lvl, (H, W) in enumerate(level_shapes):
            l = sampling = loc[:, :, :, lvl]
            ix = l[..., 0] * W - 0.5
            iy = l[..., 1] * H - 0.5
            a = aw[:, :, :, lvl]

            def pack(t):
                t = t.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
                    B, nH, P)
                t = jnp.pad(t, ((0, 0), (0, 0), (0, P_pad - P)))
                return t.reshape(B, nH * n_t, 1, TP)

            ixs.append(pack(ix))
            iys.append(pack(iy))
            aws_.append(pack(a))
            vls.append(value_levels[lvl].transpose(0, 3, 1, 2, 4)
                       .reshape(B, nH, H, W * dh).astype(jnp.bfloat16))
            sels.append((jnp.arange(W * dh, dtype=jnp.int32)[:, None] % dh
                         == jnp.arange(dh, dtype=jnp.int32)[None, :]
                         ).astype(jnp.bfloat16))

        pt_spec = pl.BlockSpec((1, 1, 1, TP),
                               lambda b, h, t, n_t=n_t: (b, h * n_t + t, 0, 0),
                               memory_space=pltpu.VMEM)
        v_specs = [pl.BlockSpec((1, 1, H, W * dh),
                                lambda b, h, t: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
                   for H, W in level_shapes]
        sel_specs = [pl.BlockSpec((W * dh, dh), lambda b, h, t: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for H, W in level_shapes]

        def wrapped(*refs):
            k = nL
            kern(refs[0:k], refs[k:2 * k], refs[2 * k:3 * k],
                 refs[3 * k:4 * k], refs[4 * k:5 * k], refs[5 * k])

        def op(z, ixs, iys, aws_, vls, sels):
            # z (a scan-carry scalar) perturbs an input so iterations cannot
            # be CSE'd/hoisted out of the measuring scan. All arrays are jit
            # ARGUMENTS — closing over them would re-upload them as program
            # constants every call (the measure.py constants trap).
            ix0 = ixs[0] + (z * 1e-12)
            return pl.pallas_call(
                wrapped,
                grid=(B, nH, n_t),
                in_specs=[pt_spec] * (3 * nL) + v_specs + sel_specs,
                out_specs=pl.BlockSpec((1, 1, TP, dh),
                                       lambda b, h, t: (b, h, t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, nH, n_t * TP, dh),
                                               jnp.float32),
            )(ix0, *ixs[1:], *iys, *aws_, *vls, *sels)

        return op, (ixs, iys, aws_, vls, sels)

    results = {}
    for mode in ("full", "no_cexp", "stage1_only", "io_only"):
        for TP in (512, 1024):
            op, args = build(mode, TP)

            def make(n, op=op, args=args):
                @jax.jit
                def run(z, ixs, iys, aws_, vls, sels):
                    def body(c, _):
                        o = op(c, ixs, iys, aws_, vls, sels)
                        return c + jnp.sum(o[0, 0, 0]), ()
                    c, _ = jax.lax.scan(body, z, None, length=n)
                    return c
                return lambda: run(jnp.float32(0.0), *args)

            try:
                slope_s, _f, _d = slope_timer(make, ns=(2, 18), repeats=2,
                                              log=log)
                ms = slope_s * 1e3
            except Exception as e:
                ms = None
                log(f"# {mode}/TP{TP} failed: {type(e).__name__}: {e}")
            results[f"{mode}_tp{TP}"] = ms and round(ms, 3)
            print(f"{mode:>12} TP={TP}: "
                  f"{'FAIL' if ms is None else '%8.3f ms/call' % ms}",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

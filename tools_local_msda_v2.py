"""Round-5 MSDA separable-kernel variants: shrink the stage-2 VPU work.

The shipped kernel (ops/pallas/msda_sep.py, 18.2 ms/call at L eval shapes)
spends ~14 ms in stage 2: building the x-hat weights Cexp at the FULL
(TP, W*dh) width (iota + //dh + astype + sub + abs + rsub + max = 7 ops/elem)
plus multiply and tree-fold. Variants measured here (all timed through a
public-API-shaped op that does its own packing, like the shipped wrapper):

  ship      the shipped kernel, as a control (re-timed, same harness)
  colsin    x-minor layout, but the column-index plane is a precomputed
            (1, W*dh) f32 INPUT -> hat is 4 ops/elem instead of 7
  tpose     transposed layout: points on LANES, channels on SUBLANES.
            T^T = V^T @ R^T is (W*dh, TP); the x-hat is built once at
            (W, TP) (4 ops on 1/dh of the elements) and expanded along
            SUBLANES by broadcast (W,1,TP)->(W,dh,TP)->reshape (W*dh,TP) —
            a layout no-op if Mosaic is smart, a single copy otherwise.
            Stage 2 is then ~2-3 ops/elem (expand + mul + sublane tree-fold).
  tpose_ck  same, but stage 2 runs in W-chunks of 16 to cap VMEM
            (full-width needs T + Cexp + M ~ 15 MB at level 0).

Each variant is numerically checked against the XLA gather reference
before timing. Usage: python tools_local_msda_v2.py [B] [res] [variants...]
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
    from detrpose_tpu.ops.ms_deform_attn import ms_deform_attn as gather_ref
    from detrpose_tpu.ops.pallas.msda_sep import ms_deform_attn_sep

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    only = set(sys.argv[3:])
    nH, nP, dh, Lq = 8, 4, 32, 1080
    s = res // 8
    level_shapes = [(s, s), (s // 2, s // 2), (s // 4, s // 4)]
    nL = 3
    TP = 512

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

    P = Lq * nP
    n_t = -(-P // TP)
    P_pad = n_t * TP

    def pack_points(loc_, aw_):
        """-> per level (ix, iy, a), each (B, nH*n_t, 1, TP) f32."""
        out = []
        for lvl, (H, W) in enumerate(level_shapes):
            l = loc_[:, :, :, lvl]

            def pack(t):
                t = t.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
                    B, nH, P)
                t = jnp.pad(t, ((0, 0), (0, 0), (0, P_pad - P)))
                return t.reshape(B, nH * n_t, 1, TP)

            out.append((pack(l[..., 0] * W - 0.5),
                        pack(l[..., 1] * H - 0.5),
                        pack(aw_[:, :, :, lvl])))
        return out

    pt_spec = pl.BlockSpec((1, 1, 1, TP),
                           lambda b, h, t, n_t=n_t: (b, h * n_t + t, 0, 0),
                           memory_space=pltpu.VMEM)

    # ---------------- variant: colsin (x-minor, cols as input) ----------
    def build_colsin():
        colss = [jnp.asarray((np.arange(W * dh) // dh)[None, :], jnp.float32)
                 for H, W in level_shapes]

        def kern(refs):
            k = nL
            ix_refs, iy_refs = refs[0:k], refs[k:2 * k]
            aw_refs, v_refs = refs[2 * k:3 * k], refs[3 * k:4 * k]
            c_refs, o_ref = refs[4 * k:5 * k], refs[5 * k]
            acc = None
            for lvl, (H, W) in enumerate(level_shapes):
                ix = ix_refs[lvl][0, 0].reshape(TP, 1)
                iy = iy_refs[lvl][0, 0].reshape(TP, 1)
                a = aw_refs[lvl][0, 0].reshape(TP, 1)
                rows = jax.lax.broadcasted_iota(jnp.float32, (TP, H), 1)
                R = ((jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0)) * a
                     ).astype(jnp.bfloat16)
                T = jnp.dot(R, v_refs[lvl][0, 0],
                            preferred_element_type=jnp.float32)
                Cexp = jnp.maximum(1.0 - jnp.abs(ix - c_refs[lvl][:]), 0.0)
                M = T * Cexp
                w = W
                while w % 2 == 0 and w > 1:
                    half = (w // 2) * dh
                    M = M[:, :half] + M[:, half:2 * half]
                    w //= 2
                part = M[:, :dh]
                for i in range(1, w):
                    part = part + M[:, i * dh:(i + 1) * dh]
                acc = part if acc is None else acc + part
            o_ref[0, 0] = acc

        v_specs = [pl.BlockSpec((1, 1, H, W * dh), lambda b, h, t: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
                   for H, W in level_shapes]
        c_specs = [pl.BlockSpec((1, W * dh), lambda b, h, t: (0, 0),
                                memory_space=pltpu.VMEM)
                   for H, W in level_shapes]

        def op(vls_, loc_, aw_):
            pts = pack_points(loc_, aw_)
            vpack = [vls_[lvl].transpose(0, 3, 1, 2, 4)
                     .reshape(B, nH, H, W * dh).astype(jnp.bfloat16)
                     for lvl, (H, W) in enumerate(level_shapes)]
            out = pl.pallas_call(
                lambda *refs: kern(refs),
                grid=(B, nH, n_t),
                in_specs=[pt_spec] * (3 * nL) + v_specs + c_specs,
                out_specs=pl.BlockSpec((1, 1, TP, dh),
                                       lambda b, h, t: (b, h, t, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, nH, n_t * TP, dh),
                                               jnp.float32),
            )(*[p[0] for p in pts], *[p[1] for p in pts],
              *[p[2] for p in pts], *vpack, *colss)
            out = out[:, :, :P].reshape(B, nH, Lq, nP, dh).sum(axis=3)
            return (out.transpose(0, 2, 1, 3).reshape(B, Lq, nH * dh)
                    .astype(vls_[0].dtype))

        return op

    # ---------------- variant: tpose (points on lanes) ------------------
    def build_tpose(chunk=None):
        def kern(refs):
            k = nL
            ix_refs, iy_refs = refs[0:k], refs[k:2 * k]
            aw_refs, v_refs = refs[2 * k:3 * k], refs[3 * k:4 * k]
            o_ref = refs[4 * k]
            acc = None
            for lvl, (H, W) in enumerate(level_shapes):
                ix = ix_refs[lvl][0, 0]          # (1, TP)
                iy = iy_refs[lvl][0, 0]
                a = aw_refs[lvl][0, 0]
                rows = jax.lax.broadcasted_iota(jnp.float32, (H, TP), 0)
                R = (jnp.maximum(1.0 - jnp.abs(iy - rows), 0.0) * a
                     ).astype(jnp.bfloat16)       # (H, TP)
                T = jnp.dot(v_refs[lvl][0, 0], R,
                            preferred_element_type=jnp.float32)  # (W*dh, TP)
                xsz = chunk or W
                part = None
                for x0 in range(0, W, xsz):
                    xs = jax.lax.broadcasted_iota(
                        jnp.float32, (xsz, TP), 0) + float(x0)
                    Chat = jnp.maximum(1.0 - jnp.abs(ix - xs), 0.0)
                    Cexp = jnp.broadcast_to(
                        Chat[:, None, :], (xsz, dh, TP)).reshape(
                            xsz * dh, TP)
                    M = T[x0 * dh:(x0 + xsz) * dh] * Cexp
                    w = xsz
                    while w % 2 == 0 and w > 1:
                        half = (w // 2) * dh
                        M = M[:half] + M[half:2 * half]
                        w //= 2
                    p = M[:dh]
                    for i in range(1, w):
                        p = p + M[i * dh:(i + 1) * dh]
                    part = p if part is None else part + p
                acc = part if acc is None else acc + part
            o_ref[0, 0] = acc

        v_specs = [pl.BlockSpec((1, 1, W * dh, H), lambda b, h, t: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
                   for H, W in level_shapes]

        def op(vls_, loc_, aw_):
            pts = pack_points(loc_, aw_)
            # V^T per level: (B, nH, W*dh, H), row x*dh+d = V[y, x, d] over y
            vpack = [vls_[lvl].transpose(0, 3, 2, 4, 1)
                     .reshape(B, nH, W * dh, H).astype(jnp.bfloat16)
                     for lvl, (H, W) in enumerate(level_shapes)]
            out = pl.pallas_call(
                lambda *refs: kern(refs),
                grid=(B, nH, n_t),
                in_specs=[pt_spec] * (3 * nL) + v_specs,
                out_specs=pl.BlockSpec((1, 1, dh, TP),
                                       lambda b, h, t: (b, h, 0, t),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, nH, dh, n_t * TP),
                                               jnp.float32),
            )(*[p[0] for p in pts], *[p[1] for p in pts],
              *[p[2] for p in pts], *vpack)
            out = out[:, :, :, :P].reshape(B, nH, dh, Lq, nP).sum(axis=4)
            return (out.transpose(0, 3, 1, 2).reshape(B, Lq, nH * dh)
                    .astype(vls_[0].dtype))

        return op

    builders = {
        "ship": lambda: (lambda vls_, loc_, aw_:
                         ms_deform_attn_sep(list(vls_), loc_, aw_)),
        "colsin": build_colsin,
        "tpose": functools.partial(build_tpose, chunk=None),
        "tpose_ck": functools.partial(build_tpose, chunk=16),
    }

    ref = np.asarray(gather_ref(
        [v.astype(jnp.float32) for v in value_levels], loc, aw))
    scale = np.abs(ref).max()

    results = {}
    for name, build in builders.items():
        if only and name not in only:
            continue
        try:
            op = build()
            got = np.asarray(jax.jit(op)(value_levels, loc, aw)
                             ).astype(np.float32)
            err = np.abs(got - ref).max() / scale
            log(f"# {name}: max rel err vs gather = {err:.2e}")
            assert err < 2e-2, f"{name} numerics off: {err}"

            def make(n, op=op):
                @jax.jit
                def run(vls_, loc_, aw_):
                    def body(c, _):
                        o = op(vls_, loc_ + c * 1e-12, aw_)
                        return jnp.float32(jnp.sum(o[0, 0])), ()
                    c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=n)
                    return c
                return lambda: run(value_levels, loc, aw)

            slope_s, _f, _d = slope_timer(make, ns=(2, 18), repeats=2, log=log)
            results[name] = {"ms": round(slope_s * 1e3, 3),
                             "max_rel_err": float(f"{err:.3e}")}
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"# {name} FAILED: {type(e).__name__}: {e}")
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

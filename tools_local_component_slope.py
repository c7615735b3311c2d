"""Bisect the DETRPose forward on TPU: execution-proven (scan slope) timing
of each stage — backbone, encoder, transformer, postprocess — at the bench
shape (L, bs32, 640px by default).

Context: BENCH r5 measured the full forward at 1,104 ms/batch (MFU 1.6%) on
a chip whose matmul control runs at 175 TFLOP/s (88% peak) in the same
process — the program, not the runtime, is ~55x off roofline. This tool
finds where the time goes without a profiler (jax.profiler hangs on this
runtime; see ARCHITECTURE.md round-5 section).

Usage: python tools_local_component_slope.py [size] [batch] [res]
"""
import json
import sys

import numpy as np


def main():
    from detrpose_tpu.utils.compilation_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from detrpose_tpu.configs import model_config, build_model
    from detrpose_tpu.models import postprocess
    from detrpose_tpu.utils.measure import slope_timer

    size = sys.argv[1] if len(sys.argv) > 1 else "l"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    ns = (2, int(sys.argv[4]) if len(sys.argv) > 4 else 10)

    cfg = model_config(size, dtype=jnp.bfloat16)
    model = build_model(cfg)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
                           train=False))()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, res, res, 3)).astype(np.float32))
    ts = jnp.full((batch, 2), float(res), jnp.float32)

    def log(m):
        print(m, file=sys.stderr, flush=True)

    def stage_slope(name, fn, *args):
        """fn(variables, xi, *args) -> pytree; slope over scan length."""
        def make(n):
            @jax.jit
            def run(v, img, *rest):
                def body(carry, _):
                    xi = img + (carry * 1e-12).astype(img.dtype)
                    out = fn(v, xi, *rest)
                    first = jax.tree.leaves(out)[0]
                    return jnp.sum(first).astype(jnp.float32), ()
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            return lambda: run(variables, x, *args)
        slope_s, _fx, _d = slope_timer(make, ns=ns, repeats=2, log=log)
        ms = slope_s * 1e3
        print(f"{name:>28}: {ms:9.2f} ms/batch", flush=True)
        return ms

    def run_backbone(v, img):
        return model.backbone.apply({"params": v["params"]["backbone"],
                                     "batch_stats": v["batch_stats"]["backbone"]},
                                    img, False)

    def run_bb_enc(v, img):
        feats = run_backbone(v, img)
        enc_vars = {"params": v["params"]["encoder"]}
        if "encoder" in v.get("batch_stats", {}):
            enc_vars["batch_stats"] = v["batch_stats"]["encoder"]
        return model.encoder.apply(enc_vars, feats, False)

    def run_full(v, img):
        return model.apply(v, img, train=False)

    def run_full_post(v, img, sizes):
        out = model.apply(v, img, train=False)
        return postprocess(out, sizes, num_body_points=cfg.num_body_points)

    r = {}
    r["backbone"] = stage_slope("backbone", run_backbone)
    r["backbone+encoder"] = stage_slope("backbone+encoder", run_bb_enc)
    r["full (no postprocess)"] = stage_slope("full (no postprocess)", run_full)
    r["full + postprocess"] = stage_slope("full + postprocess", run_full_post, ts)
    r["encoder (delta)"] = r["backbone+encoder"] - r["backbone"]
    r["transformer (delta)"] = r["full (no postprocess)"] - r["backbone+encoder"]
    r["postprocess (delta)"] = r["full + postprocess"] - r["full (no postprocess)"]
    print(json.dumps({k: round(v, 2) for k, v in r.items()}))


if __name__ == "__main__":
    main()

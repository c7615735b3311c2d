"""Persistent XLA compilation cache for all CLI entry points.

Serving/deployment practice: the first process compiles (L eval ~35 s via the
remote compiler here), every later process with the same (program, topology)
loads from disk (measured: 9.7 s -> 2.5 s for N-320 on this chip). Opt out
with DETRPOSE_NO_COMPILE_CACHE=1; override the location with
DETRPOSE_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    if os.environ.get("DETRPOSE_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = os.environ.get(
        "DETRPOSE_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/detrpose_tpu/jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is best-effort; never block the run

"""Pallas TPU kernels (optional, measured against the XLA paths).

`ms_deform_attn_sep` / `ms_deform_attn_fast` — separable-one-hot MSDA: two
MXU matmuls per level, no gathers, no scalar loops. Measured 19.3 ms/call at
DETRPose-L eval shapes on TPU v5e vs 168.7 ms for the XLA gather — it is the
default backend on TPU (decoder msda_backend="auto"). `_fast` wraps it in a
custom_vjp whose backward differentiates the XLA path, so training works
unchanged.

`ms_deform_attn_pallas` — the older fused-VMEM per-query kernel, kept as a
measured reference point (251.7 ms/call: scalar dynamic slices don't
vectorize; see tools/pallas_bench.py and ARCHITECTURE.md round-5 notes).
"""
from .msda import ms_deform_attn_pallas
from .msda_sep import ms_deform_attn_sep, ms_deform_attn_fast

__all__ = ["ms_deform_attn_pallas", "ms_deform_attn_sep",
           "ms_deform_attn_fast"]

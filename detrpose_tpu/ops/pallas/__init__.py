"""Pallas TPU kernels (optional, measured against the XLA paths).

`ms_deform_attn_pallas` fuses the deformable-attention gather + bilinear blend
+ attention weighting in VMEM. The XLA gather remains the default backend —
tools/pallas_bench.py records the measurement on real hardware and
tests/test_pallas_msda.py pins numerical equivalence (interpret mode on CPU).
"""
from .msda import ms_deform_attn_pallas

__all__ = ["ms_deform_attn_pallas"]

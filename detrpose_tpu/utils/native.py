"""On-demand build + ctypes loading of the native (C++) components.

The reference is pure Python/PyTorch (SURVEY.md: no native components), so the
native pieces here are TPU-framework additions, not ports: currently the
evaluator's greedy matching core (native/coco_match.cc), which removes the
hottest Python loop from 5000-image COCO evals. Everything has a pure-Python
fallback, so a missing compiler never breaks the framework.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "coco_match.cc")
_cached: Optional[object] = None
_failed = False


def _build_so() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    out_dir = os.path.join(tempfile.gettempdir(), "detrpose_tpu_native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, "coco_match.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so_path, _SRC],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    return so_path


def get_match_fn():
    """Returns the native match_image callable, or None (fallback to Python)."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    so_path = _build_so()
    if so_path is None:
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(so_path)
        fn = lib.match_image
        fn.restype = None
        fn.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _cached = fn
        return fn
    except Exception:
        _failed = True
        return None


def match_image_native(ious, thrs, gt_ignore, gt_iscrowd, gtm, dtm, dt_ignore) -> bool:
    """Run the native matcher in-place on numpy arrays. Returns False if the
    native library is unavailable (caller should use the Python path)."""
    import numpy as np

    fn = get_match_fn()
    if fn is None:
        return False
    T, G = gtm.shape
    D = dtm.shape[1]
    ious = np.ascontiguousarray(ious, np.float64)
    thrs = np.ascontiguousarray(thrs, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    gt_iscrowd = np.ascontiguousarray(gt_iscrowd, np.uint8)
    assert gtm.dtype == np.int64 and dtm.dtype == np.int64
    assert dt_ignore.dtype == np.uint8

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    fn(T, D, G, p(ious, ctypes.c_double), p(thrs, ctypes.c_double),
       p(gt_ignore, ctypes.c_uint8), p(gt_iscrowd, ctypes.c_uint8),
       p(gtm, ctypes.c_int64), p(dtm, ctypes.c_int64),
       p(dt_ignore, ctypes.c_uint8))
    return True

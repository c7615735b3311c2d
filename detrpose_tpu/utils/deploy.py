"""Deploy-time re-parameterisation as a pure params transform.

Reference semantics: hybrid_encoder.py ConvNormLayer_fuse.convert_to_deploy
(:80-111) and VGGBlock.convert_to_deploy (:156-189) — conv+BN folding and
3x3+1x1 branch merging. The reference mutates modules; here the *weights* are
transformed to fit the `deploy=True` module variants (models/layers.py), so the
deployed model runs half the FPN/PAN convolutions with no BN ops.

Usage:
    model_dep = build_model(cfg, deploy=True)
    dep_vars = fuse_for_deploy(variables)
    out = model_dep.apply(dep_vars, images, train=False)
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

_EPS = 1e-5
# ConvNormLayerFuse instances (hybrid encoder only).
_FUSE_NAMES = {"cv1", "cv2", "cv4", "cv2_conv", "cv3_conv"}


def _fold(kernel: np.ndarray, stats: Mapping[str, Any], params: Mapping[str, Any]):
    """Fold BN (eval) into a conv kernel (HWIO) -> (kernel', bias')."""
    scale = np.asarray(params["scale"])
    bias = np.asarray(params["bias"])
    mean = np.asarray(stats["mean"])
    var = np.asarray(stats["var"])
    t = scale / np.sqrt(var + _EPS)
    return kernel * t.reshape(1, 1, 1, -1), bias - mean * t


def _is_convbn(node) -> bool:
    return (isinstance(node, Mapping) and "conv" in node and "norm" in node
            and "kernel" in node.get("conv", {}))


def fuse_for_deploy(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Transform train-form variables into deploy-form (for deploy=True modules)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s, path):
        out_p: Dict[str, Any] = {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, Mapping) else {}
            if k.startswith("bottlenecks_") and _is_vgg(v):
                out_p[k] = _fuse_vgg(v, sv)
            elif k in _FUSE_NAMES and _is_convbn(v) and _in_encoder(path):
                kern, bias = _fold(np.asarray(v["conv"]["kernel"]),
                                   sv["norm"]["bn"], v["norm"]["bn"])
                out_p[k] = {"conv_bn_fused": {"kernel": kern, "bias": bias}}
            elif isinstance(v, Mapping):
                out_p[k] = walk(v, sv, path + (k,))
            else:
                out_p[k] = v
        return out_p

    def _in_encoder(path) -> bool:
        return len(path) > 0 and path[0] == "encoder"

    def _is_vgg(v) -> bool:
        return (isinstance(v, Mapping) and "conv1" in v and "conv2" in v
                and _is_convbn(v["conv1"]) and _is_convbn(v["conv2"])
                and v["conv1"]["conv"]["kernel"].shape[0] == 3
                and v["conv2"]["conv"]["kernel"].shape[0] == 1)

    def _fuse_vgg(v, sv):
        k3, b3 = _fold(np.asarray(v["conv1"]["conv"]["kernel"]),
                       sv["conv1"]["norm"]["bn"], v["conv1"]["norm"]["bn"])
        k1, b1 = _fold(np.asarray(v["conv2"]["conv"]["kernel"]),
                       sv["conv2"]["norm"]["bn"], v["conv2"]["norm"]["bn"])
        k1p = np.zeros_like(k3)
        k1p[1:2, 1:2] = k1  # pad 1x1 into the 3x3 center (hybrid_encoder.py:172-176)
        return {"conv": {"kernel": k3 + k1p, "bias": b3 + b1}}

    new_params = walk(params, stats, ())

    def strip_stats(p, s):
        """Remove batch_stats entries for fused modules; keep the rest."""
        out = {}
        for k, v in s.items():
            if k not in p:
                continue
            pv = p[k]
            if isinstance(pv, Mapping) and ("conv_bn_fused" in pv or
                                            ("conv" in pv and "bias" in pv.get("conv", {}))):
                continue  # fused away
            if isinstance(v, Mapping) and isinstance(pv, Mapping) and "mean" not in v:
                sub = strip_stats(pv, v)
                if sub:
                    out[k] = sub
            else:
                out[k] = v
        return out

    new_stats = strip_stats(new_params, stats)
    out = {"params": new_params}
    if new_stats:
        out["batch_stats"] = new_stats
    return out

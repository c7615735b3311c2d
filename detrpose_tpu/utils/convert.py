"""PyTorch checkpoint -> flax variables converter.

Maps the reference DETRPose state_dict (src/models/detrpose/*, src/nn/backbone/
hgnetv2.py) onto this package's param tree. The mapping is mechanical: flax
tree paths are rewritten to torch key strings by ordered regex rules, then each
tensor gets a layout transform (conv OIHW->HWIO, linear transpose, packed MHA
qkv split).

Supports the reference's zoo .pth layout ({'model': ..., 'ema': {'module': ...}})
as produced by its Trainer (reference: src/solver/trainer.py:223-238).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# Ordered path rewrites (applied to '/'-joined flax path, before leaf handling).
_REWRITES = [
    (r"transformer/decoder/class_head_(\d+)", r"transformer/class_embed.\1"),
    (r"transformer/decoder/pose_head_(\d+)", r"transformer/pose_embed.\1"),
    (r"transformer/decoder/lqe_head_(\d+)", r"transformer/lqe_embed.\1"),
    (r"transformer/decoder/pre_pose_head", r"transformer/pre_pose_embed"),
    (r"input_proj_(\d+)_conv", r"input_proj.\1.conv"),
    (r"input_proj_(\d+)_norm", r"input_proj.\1.norm"),
    (r"encoder_(\d+)_layers_(\d+)", r"encoder.\1.layers.\2"),
    (r"downsample_convs_(\d+)", r"downsample_convs.\1.0"),
    (r"agg_squeeze", r"aggregation.0"),
    (r"agg_excite", r"aggregation.1"),
    (r"agg_conv", r"aggregation.0"),
    (r"agg_ese", r"aggregation.1"),
    (r"cv2_csp", r"cv2.0"),
    (r"cv2_conv", r"cv2.1"),
    (r"cv3_csp", r"cv3.0"),
    (r"cv3_conv", r"cv3.1"),
    (r"(stages|blocks|layers|bottlenecks|fpn_blocks|pan_blocks|lateral_convs)_(\d+)",
     r"\1.\2"),
]

# Raw embedding params (self.param leaves -> torch nn.Embedding.weight).
_EMBED_LEAVES = ("tgt_embed", "keypoint_embedding", "instance_embedding",
                 "label_enc", "pose_enc")

_SKIP_TORCH_SUFFIXES = (
    "num_batches_tracked", "anchors", "valid_mask", "dim_t", ".up", ".reg_scale",
    "layer_loss", "project", "_base_grid_placeholder",
)


def _flax_path_to_torch_key(path: Tuple[str, ...], collection: str) -> str:
    """Map a flax variable path to the torch state_dict key."""
    *names, leaf = path
    s = "/".join(names)
    for pat, rep in _REWRITES:
        s = re.sub(pat, rep, s)
    key = s.replace("/", ".")

    # BatchNorm wrapper: my '<parent>.norm.bn' is torch '<parent>.bn' in the
    # backbone (hgnetv2 ConvBNAct) and '<parent>.norm' elsewhere
    # (hybrid_encoder ConvNormLayer / input_proj).
    if key.endswith(".norm.bn"):
        base = key[: -len(".norm.bn")]
        key = base + (".bn" if key.startswith("backbone.") else ".norm")

    if collection == "batch_stats":
        leaf_name = {"mean": "running_mean", "var": "running_var"}[leaf]
    elif leaf in _EMBED_LEAVES:
        leaf_name = f"{leaf}.weight"
    else:
        leaf_name = {
            "kernel": "weight", "scale": "weight", "bias": "bias",
            "embedding": "weight", "weight": "weight",
            "lab_scale": "lab.scale", "lab_bias": "lab.bias",
        }.get(leaf, leaf)
    return f"{key}.{leaf_name}" if key else leaf_name


def _get(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"torch key not found: {key}")
    return np.asarray(sd[key])


# Scanned decoder stack (models/decoder.py _DecoderStep under nn.scan): flax
# params carry a leading num_layers axis; torch has per-layer modules. Map the
# scan-scope child name to the legacy per-layer name pattern and stack.
_SCAN_CHILDREN = {
    "layer": "layers_{i}",
    "pose_head": "pose_head_{i}",
    "class_head": "class_head_{i}",
    "lqe_head": "lqe_head_{i}",
}


def _convert_leaf(path: Tuple[str, ...], target_shape, sd, consumed) -> np.ndarray:
    *names, leaf = path
    joined = "/".join(path)

    # Stacked scan params: peel the leading layer axis, convert each layer's
    # tensor via the legacy (unrolled) path, and stack.
    if "dec_scan" in names:
        si = names.index("dec_scan")
        child = names[si + 1]
        assert child in _SCAN_CHILDREN, f"unknown scan child {child} in {joined}"
        L = target_shape[0]
        per = []
        for i in range(L):
            legacy = (tuple(names[:si]) + (_SCAN_CHILDREN[child].format(i=i),)
                      + tuple(names[si + 2:]) + (leaf,))
            per.append(_convert_leaf(legacy, target_shape[1:], sd, consumed))
        return np.stack(per, 0)

    # MHA packed qkv: flax {q,k,v}_proj <- torch in_proj_weight/in_proj_bias.
    m = re.search(r"(q_proj|k_proj|v_proj)", joined)
    if m and ("attn" in joined):
        idx = {"q_proj": 0, "k_proj": 1, "v_proj": 2}[m.group(1)]
        base_path = path[: path.index(m.group(1))]
        base = _flax_path_to_torch_key(base_path + ("_dummy",), "params")
        base = base[: -len("._dummy")]
        if leaf == "kernel":
            w = _get(sd, f"{base}.in_proj_weight")
            consumed.add(f"{base}.in_proj_weight")
            d = w.shape[0] // 3
            return w[idx * d:(idx + 1) * d].T
        else:
            b = _get(sd, f"{base}.in_proj_bias")
            consumed.add(f"{base}.in_proj_bias")
            d = b.shape[0] // 3
            return b[idx * d:(idx + 1) * d]

    key = _flax_path_to_torch_key(path, "params")
    t = _get(sd, key)
    consumed.add(key)

    if leaf == "kernel":
        if t.ndim == 4:  # conv OIHW -> HWIO (also depthwise: O,1,kh,kw -> kh,kw,1,O)
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 2:
            t = t.T
    if leaf in ("lab_scale", "lab_bias"):
        t = t.reshape(-1)
    assert tuple(t.shape) == tuple(target_shape), (
        f"shape mismatch at {joined}: torch {t.shape} vs flax {target_shape} (key {key})"
    )
    return t


def convert_state_dict(sd: Mapping[str, Any], variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fill a flax variables template from a torch state_dict.

    Args:
      sd: torch state_dict mapping key -> tensor/ndarray.
      variables: template {'params': ..., 'batch_stats': ...} (e.g. from
        model.init or jax.eval_shape) providing the tree structure and shapes.

    Returns:
      New variables dict with converted arrays (float32).
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}
    consumed: set = set()

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            if isinstance(v, Mapping):
                out[k] = walk(v, prefix + (k,))
            else:
                out[k] = _convert_leaf(prefix + (k,), v.shape, sd, consumed).astype(np.float32)
        return out

    result = {}
    for coll, tree in variables.items():
        if coll == "params":
            result[coll] = walk(tree, ())
        else:
            result[coll] = _walk_stats(tree, (), sd, consumed)

    missing = [
        k for k in sd
        if k not in consumed and not any(k.endswith(s) or s in k for s in _SKIP_TORCH_SUFFIXES)
    ]
    if missing:
        raise ValueError(f"{len(missing)} torch keys unconsumed, e.g. {missing[:8]}")
    return result


def _walk_stats(tree, prefix, sd, consumed):
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out[k] = _walk_stats(v, prefix + (k,), sd, consumed)
        else:
            key = _flax_path_to_torch_key(prefix + (k,), "batch_stats")
            t = _get(sd, key)
            consumed.add(key)
            assert tuple(t.shape) == tuple(v.shape), (prefix + (k,), t.shape, v.shape)
            out[k] = np.asarray(t, np.float32)
    return out


def load_pretrained_backbone_encoder(
    sd: Mapping[str, Any], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Transfer-learning import: load backbone + encoder weights only,
    keeping the (randomly initialized) decoder.

    Reference semantics: Trainer.pretrain strips ``decoder.*`` keys from
    D-FINE checkpoints and loads the rest (src/solver/trainer.py:444-451).

    Args:
      sd: torch state_dict (D-FINE or DETRPose layout).
      variables: freshly initialized flax variables (templates AND values).

    Returns:
      variables with backbone/encoder leaves replaced by converted weights.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items() if not k.startswith(("decoder.", "transformer."))}
    consumed: set = set()

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            if isinstance(v, Mapping):
                out[k] = walk(v, prefix + (k,))
            else:
                out[k] = _convert_leaf(prefix + (k,), v.shape, sd, consumed).astype(np.float32)
        return out

    import jax
    import jax.numpy as jnp

    new = {c: dict(t) for c, t in variables.items()}
    for coll in list(new.keys()):
        for part in ("backbone", "encoder"):
            if part in new[coll]:
                if coll == "params":
                    converted = walk(variables[coll][part], (part,))
                else:
                    converted = _walk_stats(
                        variables[coll][part], (part,), sd, consumed)
                new[coll][part] = jax.tree.map(jnp.asarray, converted)
    return new


def load_torch_checkpoint(path: str, prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference zoo .pth into a flat numpy state_dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if prefer_ema and "ema" in ckpt and ckpt["ema"] is not None:
            sd = ckpt["ema"]["module"]
        elif "model" in ckpt:
            sd = ckpt["model"]
        else:
            sd = ckpt
    else:
        sd = ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}

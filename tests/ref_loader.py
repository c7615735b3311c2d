"""Load reference PyTorch modules from /root/reference without executing the
package __init__ chain (which pulls omegaconf / torchvision / pycocotools that
are absent here).

We fabricate namespace packages pointing into the reference tree so relative
imports resolve, and stub `omegaconf` (only referenced in dead code paths of
transformer.py).

Used ONLY in tests, to golden-check our JAX implementation and the weight
converter against the reference's exact numerics.
"""
import sys
import types

REF = "/root/reference"


def _ns_pkg(name, path):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def install_torchvision_stub():
    """torchvision is absent in this environment; the reference's data
    transforms and PostProcess import it. Provide the handful of symbols
    actually used (PIL-backed F.crop/F.hflip, box_area, an nms placeholder)."""
    if "torchvision" in sys.modules:
        return
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.crop = lambda img, i, j, h, w: img.crop((j, i, j + w, i + h))
    functional.hflip = lambda img: img.transpose(Image.FLIP_LEFT_RIGHT)

    def _pad(img, padding, fill=0, padding_mode="constant"):
        # torchvision F.pad PIL semantics: padding [l, t, r, b] (or [lr, tb],
        # or int)
        if isinstance(padding, int):
            l = t = r = b = padding
        elif len(padding) == 2:
            l, t = padding
            r, b = padding
        else:
            l, t, r, b = padding
        canvas = Image.new(img.mode, (img.width + l + r, img.height + t + b),
                           fill)
        canvas.paste(img, (l, t))
        return canvas

    functional.pad = _pad
    # torchvision F.resize default interpolation is bilinear; size is (h, w)
    functional.resize = lambda img, size: img.resize(
        tuple(size[::-1]), Image.BILINEAR)
    transforms.functional = functional
    v2 = types.ModuleType("torchvision.transforms.v2")
    v2_functional = types.ModuleType("torchvision.transforms.v2.functional")
    v2_functional.get_size = lambda img: [img.height, img.width]
    v2.functional = v2_functional
    transforms.v2 = v2
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    boxes_mod.nms = None  # imported by postprocesses.py, never called
    ops.boxes = boxes_mod
    tv.transforms = transforms
    tv.ops = ops
    for name, mod in [("torchvision", tv),
                      ("torchvision.transforms", transforms),
                      ("torchvision.transforms.functional", functional),
                      ("torchvision.transforms.v2", v2),
                      ("torchvision.transforms.v2.functional", v2_functional),
                      ("torchvision.ops", ops),
                      ("torchvision.ops.boxes", boxes_mod)]:
        sys.modules[name] = mod


def load_reference():
    """Returns the reference modules {detrpose, transformer, hybrid_encoder, hgnetv2}."""
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class _DictConfig(dict):
            pass

        class _OmegaConf:
            @staticmethod
            def to_container(x, resolve=True):
                return dict(x)

        om.DictConfig = _DictConfig
        om.OmegaConf = _OmegaConf
        om.ListConfig = list  # referenced by src/data/{container,transforms}.py
        sys.modules["omegaconf"] = om

    _ns_pkg("refsrc", f"{REF}/src")
    _ns_pkg("refsrc.models", f"{REF}/src/models")
    _ns_pkg("refsrc.models.detrpose", f"{REF}/src/models/detrpose")
    _ns_pkg("refsrc.misc", f"{REF}/src/misc")
    _ns_pkg("refsrc.nn", f"{REF}/src/nn")
    _ns_pkg("refsrc.nn.backbone", f"{REF}/src/nn/backbone")
    _ns_pkg("refsrc.data", f"{REF}/src/data")

    import importlib

    hgnetv2 = importlib.import_module("refsrc.nn.backbone.hgnetv2")
    hybrid_encoder = importlib.import_module("refsrc.models.detrpose.hybrid_encoder")
    transformer = importlib.import_module("refsrc.models.detrpose.transformer")
    detrpose = importlib.import_module("refsrc.models.detrpose.detrpose")
    return types.SimpleNamespace(
        hgnetv2=hgnetv2,
        hybrid_encoder=hybrid_encoder,
        transformer=transformer,
        detrpose=detrpose,
    )


def build_reference_model(size: str, eval_hw=(160, 160), num_body_points: int = 17):
    """Instantiate the reference torch DETRPose (pretrained=False, eval mode)."""
    import torch

    from detrpose_tpu.configs import model_config

    ref = load_reference()
    cfg = model_config(size, num_body_points=num_body_points)

    backbone = ref.hgnetv2.HGNetv2(
        name=cfg.backbone_name,
        use_lab=cfg.use_lab,
        return_idx=list(cfg.return_idx),
        pretrained=False,
    )
    encoder = ref.hybrid_encoder.HybridEncoder(
        in_channels=list(cfg.in_channels),
        feat_strides=list(cfg.feat_strides),
        n_levels=cfg.n_levels,
        hidden_dim=cfg.hidden_dim,
        nhead=8,
        dim_feedforward=cfg.enc_dim_feedforward,
        dropout=0.0,
        enc_act="gelu",
        use_encoder_idx=list(cfg.use_encoder_idx),
        num_encoder_layers=1,
        expansion=cfg.expansion,
        depth_mult=cfg.depth_mult,
        act="silu",
        eval_spatial_size=list(eval_hw),
    )
    transformer = ref.transformer.Transformer(
        hidden_dim=cfg.hidden_dim,
        dropout=0.0,
        nhead=8,
        num_queries=cfg.num_queries,
        dim_feedforward=cfg.dec_dim_feedforward,
        num_decoder_layers=cfg.num_decoder_layers,
        normalize_before=False,
        return_intermediate_dec=True,
        activation="relu",
        num_feature_levels=cfg.n_levels,
        dec_n_points=cfg.dec_n_points,
        learnable_tgt_init=True,
        two_stage_type="standard",
        num_body_points=cfg.num_body_points,
        aux_loss=True,
        num_classes=cfg.num_classes,
        dec_pred_class_embed_share=False,
        dec_pred_pose_embed_share=False,
        two_stage_class_embed_share=False,
        two_stage_bbox_embed_share=False,
        cls_no_bias=False,
        feat_strides=list(cfg.feat_strides),
        eval_spatial_size=list(eval_hw),
        reg_max=cfg.reg_max,
        reg_scale=cfg.reg_scale,
    )
    model = ref.detrpose.DETRPose(backbone, encoder, transformer)
    model.eval()
    return model, cfg

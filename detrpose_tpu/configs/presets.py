"""Model-zoo presets (N/S/M/L/X x {coco-17, crowdpose-14}).

Mirrors the reference config deltas (configs/detrpose/detrpose_hgnetv2_{n,s,m,l,x}.py
on top of include/detrpose_hgnetv2.py). These provide the programmatic factory;
the executable lazy-config system (core/lazy.py) builds on top of it.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp

from ..models import DETRPose, HGNetv2, HybridEncoder, Transformer


@dataclasses.dataclass
class ModelConfig:
    size: str = "l"
    num_body_points: int = 17
    num_classes: int = 2
    num_queries: int = 60
    eval_spatial_size: Sequence[int] = (640, 640)  # (h, w)
    # backbone
    backbone_name: str = "B4"
    use_lab: bool = False
    return_idx: Sequence[int] = (1, 2, 3)
    # encoder
    in_channels: Sequence[int] = (512, 1024, 2048)
    feat_strides: Sequence[int] = (8, 16, 32)
    n_levels: int = 3
    hidden_dim: int = 256
    enc_dim_feedforward: int = 1024
    use_encoder_idx: Sequence[int] = (2,)
    expansion: float = 1.0
    depth_mult: float = 1.0
    # transformer
    num_decoder_layers: int = 6
    dec_dim_feedforward: int = 1024
    dec_n_points: int = 4
    reg_max: int = 32
    reg_scale: float = 4.0
    # experimental decoder branches (reference experimental configs)
    use_modulation: bool = False
    use_region_sampling: bool = False
    region_kernel_size: int = 1
    use_global_context: bool = False
    use_grouped_offsets: bool = False
    num_groups: int = 1
    use_grid_attention: bool = False
    grid_num_points: int = 16
    use_grid_offsets: bool = False
    use_grid_fusion: bool = True
    # deformable-attention compute backend — all numbers are round-5
    # execution-proven scan slopes at L eval shapes (bs32/640) on TPU v5e:
    #   "auto"   (default) separable-one-hot Pallas kernel on TPU
    #            (ops/pallas/msda_sep.py, 18.2 ms/call), XLA gather elsewhere
    #   "gather" XLA gather/one-hot dual path (168.7 ms/call on TPU —
    #            descriptor-rate bound)
    #   "sep"    force the separable kernel
    #   "pallas" old per-query fused kernel (251.7 ms/call — kept as a
    #            measured reference point; the round-2 "12x slower" note was
    #            a dispatch-rate artifact, the honest ratio is 1.5x)
    msda_backend: str = "auto"
    use_kan: bool = False
    kan_grid: int = 3
    # experimental energy refinement (reference energy configs)
    use_energy_refinement: bool = False
    energy_steps: int = 3
    energy_step_size: float = 0.1
    grad_energy: bool = False
    energy_decrease_weight: float = 0.0
    # runtime
    remat: bool = False  # rematerialize backbone stages + decoder layers in training
    # lax.scan over decoder layers in training (see models/decoder.py)
    scan_layers: bool = True
    scan_unroll: int = 1  # lax.scan unroll factor for the decoder stack
    dtype: Any = jnp.float32


_SIZE_OVERRIDES = {
    "n": dict(
        backbone_name="B0", use_lab=True, return_idx=(2, 3),
        in_channels=(512, 1024), feat_strides=(16, 32), n_levels=2,
        use_encoder_idx=(1,), depth_mult=0.5, expansion=0.34,
        hidden_dim=128, enc_dim_feedforward=512,
        num_decoder_layers=3, dec_dim_feedforward=512, dec_n_points=6,
    ),
    "s": dict(
        backbone_name="B0", use_lab=True,
        in_channels=(256, 512, 1024), depth_mult=0.34, expansion=0.5,
        num_decoder_layers=3,
    ),
    "m": dict(
        backbone_name="B2", use_lab=True,
        in_channels=(384, 768, 1536), depth_mult=0.67,
        num_decoder_layers=4,
    ),
    "l": dict(),
    "x": dict(
        backbone_name="B5",
        hidden_dim=384, enc_dim_feedforward=2048, reg_scale=8.0,
    ),
}


def model_config(size: str = "l", num_body_points: int = 17, **overrides) -> ModelConfig:
    cfg = ModelConfig(size=size, num_body_points=num_body_points)
    known = {f.name for f in dataclasses.fields(ModelConfig)}
    for k, v in _SIZE_OVERRIDES[size].items():
        setattr(cfg, k, v)
    for k, v in overrides.items():
        if k not in known:
            raise TypeError(f"unknown ModelConfig override: {k!r}")
        setattr(cfg, k, v)
    # ResNet alternative backbone (reference src/nn/backbone/resnet.py —
    # present but unused by shipped configs): C3/C4/C5 channels are fixed
    if cfg.backbone_name.startswith("resnet") and "in_channels" not in overrides:
        cfg.in_channels = (512, 1024, 2048)
    return cfg


def build_model(cfg: ModelConfig, deploy: bool = False) -> DETRPose:
    if cfg.backbone_name.startswith("resnet"):
        from ..models.resnet import ResNet

        backbone = ResNet(depth=int(cfg.backbone_name[len("resnet"):]),
                          return_idx=(1, 2, 3), dtype=cfg.dtype)
    else:
        backbone = HGNetv2(
            arch=cfg.backbone_name, use_lab=cfg.use_lab,
            return_idx=tuple(cfg.return_idx),
            remat=cfg.remat, dtype=cfg.dtype,
        )
    encoder = HybridEncoder(
        in_channels=tuple(cfg.in_channels), feat_strides=tuple(cfg.feat_strides),
        n_levels=cfg.n_levels, hidden_dim=cfg.hidden_dim,
        dim_feedforward=cfg.enc_dim_feedforward,
        use_encoder_idx=tuple(cfg.use_encoder_idx),
        expansion=cfg.expansion, depth_mult=cfg.depth_mult,
        deploy=deploy, dtype=cfg.dtype,
    )
    transformer = Transformer(
        hidden_dim=cfg.hidden_dim, num_queries=cfg.num_queries,
        num_decoder_layers=cfg.num_decoder_layers,
        dim_feedforward=cfg.dec_dim_feedforward,
        num_feature_levels=cfg.n_levels, dec_n_points=cfg.dec_n_points,
        num_classes=cfg.num_classes, num_body_points=cfg.num_body_points,
        reg_max=cfg.reg_max, reg_scale=cfg.reg_scale,
        use_modulation=cfg.use_modulation,
        use_region_sampling=cfg.use_region_sampling,
        region_kernel_size=cfg.region_kernel_size,
        use_global_context=cfg.use_global_context,
        use_grouped_offsets=cfg.use_grouped_offsets,
        num_groups=cfg.num_groups,
        use_grid_attention=cfg.use_grid_attention,
        grid_num_points=cfg.grid_num_points,
        use_grid_offsets=cfg.use_grid_offsets,
        use_grid_fusion=cfg.use_grid_fusion,
        msda_backend=cfg.msda_backend,
        use_kan=cfg.use_kan, kan_grid=cfg.kan_grid,
        remat=cfg.remat,
        scan_layers=cfg.scan_layers,
        scan_unroll=cfg.scan_unroll,
        use_energy_refinement=cfg.use_energy_refinement,
        energy_steps=cfg.energy_steps, energy_step_size=cfg.energy_step_size,
        grad_energy=cfg.grad_energy,
        energy_decrease_weight=cfg.energy_decrease_weight,
        dtype=cfg.dtype,
    )
    return DETRPose(backbone=backbone, encoder=encoder, transformer=transformer)

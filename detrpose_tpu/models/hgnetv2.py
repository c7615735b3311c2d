"""HGNetv2 (PP-HGNetV2) backbone, NHWC flax implementation.

Reference semantics: src/nn/backbone/hgnetv2.py (StemBlock :169-220,
HG_Block :243-329, HG_Stage :332-383, arch table :398-476, forward :586-593).
Stages use 'se' aggregation (two 1x1 ConvBNActs), matching the reference's
HG_Stage default. freeze_norm / freeze_at are training-time optimizer masks in
JAX (see train/optim.py), not module structure.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBNAct, LightConvBNAct, EseModule

# name -> (stem_channels, {stage: [in, mid, out, nblocks, downsample, light, k, nlayers]})
ARCH_CONFIGS = {
    "B0": ([3, 16, 16], [
        [16, 16, 64, 1, False, False, 3, 3],
        [64, 32, 256, 1, True, False, 3, 3],
        [256, 64, 512, 2, True, True, 5, 3],
        [512, 128, 1024, 1, True, True, 5, 3],
    ]),
    "B1": ([3, 24, 32], [
        [32, 32, 64, 1, False, False, 3, 3],
        [64, 48, 256, 1, True, False, 3, 3],
        [256, 96, 512, 2, True, True, 5, 3],
        [512, 192, 1024, 1, True, True, 5, 3],
    ]),
    "B2": ([3, 24, 32], [
        [32, 32, 96, 1, False, False, 3, 4],
        [96, 64, 384, 1, True, False, 3, 4],
        [384, 128, 768, 3, True, True, 5, 4],
        [768, 256, 1536, 1, True, True, 5, 4],
    ]),
    "B3": ([3, 24, 32], [
        [32, 32, 128, 1, False, False, 3, 5],
        [128, 64, 512, 1, True, False, 3, 5],
        [512, 128, 1024, 3, True, True, 5, 5],
        [1024, 256, 2048, 1, True, True, 5, 5],
    ]),
    "B4": ([3, 32, 48], [
        [48, 48, 128, 1, False, False, 3, 6],
        [128, 96, 512, 1, True, False, 3, 6],
        [512, 192, 1024, 3, True, True, 5, 6],
        [1024, 384, 2048, 1, True, True, 5, 6],
    ]),
    "B5": ([3, 32, 64], [
        [64, 64, 128, 1, False, False, 3, 6],
        [128, 128, 512, 2, True, False, 3, 6],
        [512, 256, 1024, 5, True, True, 5, 6],
        [1024, 512, 2048, 2, True, True, 5, 6],
    ]),
    "B6": ([3, 48, 96], [
        [96, 96, 192, 2, False, False, 3, 6],
        [192, 192, 512, 3, True, False, 3, 6],
        [512, 384, 1024, 6, True, True, 5, 6],
        [1024, 768, 2048, 3, True, True, 5, 6],
    ]),
}


class StemBlock(nn.Module):
    """Reference: hgnetv2.py:169-220 (asymmetric right/bottom padding)."""
    mid_chs: int
    out_chs: int
    use_lab: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBNAct(self.mid_chs, 3, 2, use_lab=self.use_lab,
                      dtype=self.dtype, name="stem1")(x, train)
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x2 = ConvBNAct(self.mid_chs // 2, 2, 1, use_lab=self.use_lab,
                       dtype=self.dtype, name="stem2a")(x, train)
        x2 = jnp.pad(x2, [(0, 0), (0, 1), (0, 1), (0, 0)])
        x2 = ConvBNAct(self.mid_chs, 2, 1, use_lab=self.use_lab,
                       dtype=self.dtype, name="stem2b")(x2, train)
        # MaxPool2d(kernel=2, stride=1, ceil_mode=True) on the padded map.
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBNAct(self.mid_chs, 3, 2, use_lab=self.use_lab,
                      dtype=self.dtype, name="stem3")(x, train)
        x = ConvBNAct(self.out_chs, 1, 1, use_lab=self.use_lab,
                      dtype=self.dtype, name="stem4")(x, train)
        return x


class HGBlock(nn.Module):
    """Reference: hgnetv2.py:243-329 with agg='se' (HG_Stage default)."""
    mid_chs: int
    out_chs: int
    layer_num: int
    kernel_size: int = 3
    residual: bool = False
    light_block: bool = False
    use_lab: bool = False
    agg: str = "se"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        outs = [x]
        for i in range(self.layer_num):
            if self.light_block:
                x = LightConvBNAct(self.mid_chs, self.kernel_size,
                                   use_lab=self.use_lab, dtype=self.dtype,
                                   name=f"layers_{i}")(x, train)
            else:
                x = ConvBNAct(self.mid_chs, self.kernel_size, 1,
                              use_lab=self.use_lab, dtype=self.dtype,
                              name=f"layers_{i}")(x, train)
            outs.append(x)
        y = jnp.concatenate(outs, axis=-1)
        if self.agg == "se":
            y = ConvBNAct(self.out_chs // 2, 1, 1, use_lab=self.use_lab,
                          dtype=self.dtype, name="agg_squeeze")(y, train)
            y = ConvBNAct(self.out_chs, 1, 1, use_lab=self.use_lab,
                          dtype=self.dtype, name="agg_excite")(y, train)
        else:
            y = ConvBNAct(self.out_chs, 1, 1, use_lab=self.use_lab,
                          dtype=self.dtype, name="agg_conv")(y, train)
            y = EseModule(self.out_chs, dtype=self.dtype, name="agg_ese")(y)
        if self.residual:
            y = y + identity
        return y


class HGStage(nn.Module):
    """Reference: hgnetv2.py:332-383."""
    mid_chs: int
    out_chs: int
    block_num: int
    layer_num: int
    downsample: bool = True
    light_block: bool = False
    kernel_size: int = 3
    use_lab: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.downsample:
            in_chs = x.shape[-1]
            x = ConvBNAct(in_chs, 3, 2, groups=in_chs, use_act=False,
                          use_lab=self.use_lab, dtype=self.dtype,
                          name="downsample")(x, train)
        for i in range(self.block_num):
            x = HGBlock(self.mid_chs, self.out_chs, self.layer_num,
                        kernel_size=self.kernel_size, residual=i > 0,
                        light_block=self.light_block, use_lab=self.use_lab,
                        dtype=self.dtype, name=f"blocks_{i}")(x, train)
        return x


class HGNetv2(nn.Module):
    """Multi-scale CNN backbone; returns features at the requested stages.

    Reference: hgnetv2.py:386-593. ``return_idx`` selects stages (stride 4/8/16/32).
    ``freeze_norm=True`` (the reference default) keeps every backbone BatchNorm
    in inference mode during training — the FrozenBatchNorm2d semantics of
    hgnetv2.py:24-60; the affine params are additionally masked out of the
    optimizer (train/optim.py).
    """
    arch: str = "B4"
    use_lab: bool = False
    return_idx: Sequence[int] = (1, 2, 3)
    freeze_norm: bool = True
    remat: bool = False  # jax.checkpoint each stage (memory for FLOPs in training)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        if self.freeze_norm:
            train = False  # BN stays in eval mode; convs still get gradients
        stem_channels, stage_config = ARCH_CONFIGS[self.arch]
        x = StemBlock(stem_channels[1], stem_channels[2], use_lab=self.use_lab,
                      dtype=self.dtype, name="stem")(x, train)
        outs = []
        Stage = nn.remat(HGStage, static_argnums=(2,)) if self.remat else HGStage
        for i, (cin, cmid, cout, nblocks, down, light, k, nlayers) in enumerate(stage_config):
            x = Stage(cmid, cout, nblocks, nlayers, downsample=down,
                      light_block=light, kernel_size=k, use_lab=self.use_lab,
                      dtype=self.dtype, name=f"stages_{i}")(x, train)
            if i in self.return_idx:
                outs.append(x)
        return outs

    @staticmethod
    def out_channels(name: str, return_idx: Sequence[int]) -> List[int]:
        _, cfg = ARCH_CONFIGS[name]
        return [cfg[i][2] for i in return_idx]

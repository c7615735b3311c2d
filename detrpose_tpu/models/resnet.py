"""ResNet-50/101 backbone with frozen BatchNorm.

Reference: src/nn/backbone/resnet.py:61-100 (torchvision ResNet wrapped with
FrozenBatchNorm2d + IntermediateLayerGetter). Present for capability parity —
the shipped DETRPose configs all use HGNetv2, same as the reference.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BatchNorm


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = BatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = BatchNorm(dtype=self.dtype, name="bn2")(y, train)
        y = jax.nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = BatchNorm(dtype=self.dtype, name="bn3")(y, train)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, train)
        return jax.nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-50 (depth=50) or -101 returning C3/C4/C5 (strides 8/16/32)."""
    depth: int = 50
    return_idx: Sequence[int] = (1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        x = jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)])
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = jax.nn.relu(x)
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        outs = []
        planes = [64, 128, 256, 512]
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for b in range(blocks[stage]):
                x = Bottleneck(planes[stage], stride=stride if b == 0 else 1,
                               downsample=b == 0, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train)
            if stage in self.return_idx:
                outs.append(x)
        return outs

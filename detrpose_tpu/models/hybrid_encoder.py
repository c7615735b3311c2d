"""HybridEncoder: AIFI transformer on the coarsest level + CSP-PAN fusion.

Reference semantics: src/models/detrpose/hybrid_encoder.py:324-507 —
per-level 1x1 conv+BN projection, a small transformer encoder over the
flattened stride-32 tokens with 2D sine position embedding, then top-down FPN
(lateral 1x1 + nearest 2x upsample + RepNCSPELAN4) and bottom-up PAN (SCDown +
RepNCSPELAN4).

TPU-first notes: NHWC throughout; the position embedding is a trace-time
constant at fixed resolution; attention runs as plain batched matmuls (400
tokens at 640x640) — no flash/blockwise machinery needed at this size.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    BatchNorm,
    ConvNormLayer,
    MultiHeadAttention,
    RepNCSPELAN4,
    SCDown,
    get_activation,
)
from ..ops.pos_embed import sine_hw_position_embedding


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer. Reference: hybrid_encoder.py:244-296."""
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    activation: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src: jax.Array, pos_embed: Optional[jax.Array] = None) -> jax.Array:
        q = k = src if pos_embed is None else src + pos_embed
        attn = MultiHeadAttention(self.d_model, self.nhead, dtype=self.dtype,
                                  name="self_attn")(q, k, src)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        ff = get_activation(self.activation)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + ff)


class HybridEncoder(nn.Module):
    """Reference: hybrid_encoder.py:324-507."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    feat_strides: Sequence[int] = (8, 16, 32)
    n_levels: int = 3
    hidden_dim: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    enc_act: str = "gelu"
    use_encoder_idx: Sequence[int] = (2,)
    num_encoder_layers: int = 1
    expansion: float = 1.0
    depth_mult: float = 1.0
    act: str = "silu"
    temperature_w: float = 20.0
    temperature_h: float = 20.0
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False) -> List[jax.Array]:
        assert len(feats) == len(self.in_channels)
        hd = self.hidden_dim

        # Per-level projection: 1x1 conv (no bias) + BN.
        proj = []
        for i, f in enumerate(feats):
            p = nn.Conv(hd, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"input_proj_{i}_conv")(f)
            p = BatchNorm(dtype=self.dtype, name=f"input_proj_{i}_norm")(p, train)
            proj.append(p)

        # AIFI encoder on selected level(s).
        for i, enc_idx in enumerate(self.use_encoder_idx):
            x = proj[enc_idx]
            B, H, W, C = x.shape
            src = x.reshape(B, H * W, C)
            # Reference builds the eval-time buffer with (w, h) = eval_size//stride
            # (hybrid_encoder.py:424-428); at a fixed traced shape this is identical.
            pos = sine_hw_position_embedding(
                W, H, hd // 2, self.temperature_w, self.temperature_h
            ).astype(src.dtype)
            for j in range(self.num_encoder_layers):
                src = TransformerEncoderLayer(
                    hd, self.nhead, self.dim_feedforward, self.enc_act,
                    dtype=self.dtype, name=f"encoder_{i}_layers_{j}",
                )(src, pos)
            proj[enc_idx] = src.reshape(B, H, W, C)

        n_blocks = round(3 * self.depth_mult)
        c4 = round(self.expansion * hd // 2)

        # Top-down FPN.
        inner_outs = [proj[-1]]
        for idx in range(self.n_levels - 1, 0, -1):
            k = self.n_levels - 1 - idx
            feat_high = ConvNormLayer(hd, 1, 1, act=self.act, dtype=self.dtype,
                                      name=f"lateral_convs_{k}")(inner_outs[0], train)
            inner_outs[0] = feat_high
            feat_low = proj[idx - 1]
            up = jax.image.resize(
                feat_high,
                (feat_high.shape[0], feat_high.shape[1] * 2, feat_high.shape[2] * 2, hd),
                method="nearest",
            )
            inner = RepNCSPELAN4(hd, hd * 2, c4, n_blocks, act=self.act,
                                 deploy=self.deploy, dtype=self.dtype,
                                 name=f"fpn_blocks_{k}")(
                jnp.concatenate([up, feat_low], axis=-1), train)
            inner_outs.insert(0, inner)

        # Bottom-up PAN.
        outs = [inner_outs[0]]
        for idx in range(self.n_levels - 1):
            down = SCDown(hd, 3, 2, deploy=self.deploy, dtype=self.dtype,
                          name=f"downsample_convs_{idx}")(outs[-1], train)
            out = RepNCSPELAN4(hd, hd * 2, c4, n_blocks, act=self.act,
                               deploy=self.deploy, dtype=self.dtype,
                               name=f"pan_blocks_{idx}")(
                jnp.concatenate([down, inner_outs[idx + 1]], axis=-1), train)
            outs.append(out)

        return outs

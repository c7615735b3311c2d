"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

These mirror the *semantics* of the reference blocks (cited per class) while
being idiomatic JAX: pure modules over a params pytree, BatchNorm folding done
as a params transform at deploy time (see utils/deploy.py) instead of module
surgery, and all padding given explicitly so shapes stay static under jit.

Naming is chosen so the torch->flax weight converter (utils/convert.py) is a
mechanical per-module mapping.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def get_activation(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Activation registry (reference: hybrid_encoder.py:19-54).

    torch nn.GELU defaults to the exact erf form, so we disable the tanh
    approximation to stay bit-close.
    """
    if name is None:
        return lambda x: x
    name = name.lower()
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "leaky_relu":
        return lambda x: jax.nn.leaky_relu(x, 0.01)
    if name == "hardsigmoid":
        return jax.nn.hard_sigmoid
    raise ValueError(f"unknown activation {name!r}")


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1 -> flax 0.9).

    Under pjit with a batch-sharded mesh the reduction over the batch axis is
    global, so SyncBatchNorm (reference: dist_utils.py:122) comes for free.
    """
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class ConvBNAct(nn.Module):
    """Conv + BN + activation (+ optional LearnableAffineBlock).

    Reference: src/nn/backbone/hgnetv2.py:82-134. ``padding='same'`` means the
    reference's ZeroPad2d([0,1,0,1]) + VALID conv (right/bottom pad by 1).
    """
    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: str = ""  # "" -> symmetric (k-1)//2; "same" -> pad right/bottom 1, VALID
    use_act: bool = True
    use_lab: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel_size
        if self.padding == "same":
            pad = [(0, 1), (0, 1)]
        else:
            p = (k - 1) // 2
            pad = [(p, p), (p, p)]
        x = nn.Conv(
            self.out_chs, (k, k), strides=(self.stride, self.stride),
            padding=pad, feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        if self.use_act:
            x = jax.nn.relu(x)
            if self.use_lab:
                scale = self.param("lab_scale", nn.initializers.ones, (1,))
                bias = self.param("lab_bias", nn.initializers.zeros, (1,))
                x = scale.astype(x.dtype) * x + bias.astype(x.dtype)
        return x


class LightConvBNAct(nn.Module):
    """1x1 conv (no act) + depthwise kxk conv (act). Reference: hgnetv2.py:137-166."""
    out_chs: int
    kernel_size: int
    use_lab: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBNAct(self.out_chs, 1, use_act=False, use_lab=self.use_lab,
                      dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNAct(self.out_chs, self.kernel_size, groups=self.out_chs,
                      use_act=True, use_lab=self.use_lab,
                      dtype=self.dtype, name="conv2")(x, train)
        return x


class EseModule(nn.Module):
    """Effective-SE channel attention. Reference: hgnetv2.py:223-240."""
    chs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.chs, (1, 1), use_bias=True, dtype=self.dtype, name="conv")(s)
        return x * jax.nn.sigmoid(s)


class ConvNormLayer(nn.Module):
    """Conv + BN + act used by the hybrid encoder. Reference: hybrid_encoder.py:114-128."""
    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    padding: Optional[int] = None
    use_bias: bool = False
    act: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = (self.kernel_size - 1) // 2 if self.padding is None else self.padding
        x = nn.Conv(
            self.out_chs, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            feature_group_count=self.groups, use_bias=self.use_bias,
            dtype=self.dtype, name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        return get_activation(self.act)(x)


class VGGBlock(nn.Module):
    """RepVGG-style 3x3 + 1x1 dual-branch block (train form).

    Reference: hybrid_encoder.py:139-189. Deploy-time re-parameterisation into a
    single 3x3 conv is a params transform (utils/deploy.py), gated by `deploy`.
    """
    out_chs: int
    act: str = "relu"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.deploy:
            y = nn.Conv(self.out_chs, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, dtype=self.dtype, name="conv")(x)
        else:
            y1 = ConvNormLayer(self.out_chs, 3, 1, padding=1, act=None,
                               dtype=self.dtype, name="conv1")(x, train)
            y2 = ConvNormLayer(self.out_chs, 1, 1, padding=0, act=None,
                               dtype=self.dtype, name="conv2")(x, train)
            y = y1 + y2
        return get_activation(self.act)(y)


class ConvNormLayerFuse(nn.Module):
    """Conv + BN (+act) that folds to a biased conv at deploy.

    Reference: hybrid_encoder.py:56-111.
    """
    out_chs: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    act: Optional[str] = None
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = (self.kernel_size - 1) // 2
        if self.deploy:
            x = nn.Conv(
                self.out_chs, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
                feature_group_count=self.groups, use_bias=True,
                dtype=self.dtype, name="conv_bn_fused",
            )(x)
        else:
            x = nn.Conv(
                self.out_chs, (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
                feature_group_count=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, name="conv",
            )(x)
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        return get_activation(self.act)(x)


class SCDown(nn.Module):
    """1x1 proj + depthwise stride-2 downsample. Reference: hybrid_encoder.py:130-137."""
    out_chs: int
    kernel_size: int
    stride: int
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvNormLayerFuse(self.out_chs, 1, 1, deploy=self.deploy,
                              dtype=self.dtype, name="cv1")(x, train)
        x = ConvNormLayerFuse(self.out_chs, self.kernel_size, self.stride,
                              groups=self.out_chs, deploy=self.deploy,
                              dtype=self.dtype, name="cv2")(x, train)
        return x


class CSPLayer(nn.Module):
    """CSP bottleneck stack. Reference: hybrid_encoder.py:215-240."""
    out_chs: int
    num_blocks: int = 3
    expansion: float = 1.0
    act: str = "silu"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_chs * self.expansion)
        x1 = ConvNormLayer(hidden, 1, 1, act=self.act, dtype=self.dtype,
                           name="conv1")(x, train)
        for i in range(self.num_blocks):
            x1 = VGGBlock(hidden, act=self.act, deploy=self.deploy,
                          dtype=self.dtype, name=f"bottlenecks_{i}")(x1, train)
        x2 = ConvNormLayer(hidden, 1, 1, act=self.act, dtype=self.dtype,
                           name="conv2")(x, train)
        y = x1 + x2
        if hidden != self.out_chs:
            y = ConvNormLayer(self.out_chs, 1, 1, act=self.act, dtype=self.dtype,
                              name="conv3")(y, train)
        return y


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN fusion block of the FPN/PAN. Reference: hybrid_encoder.py:192-212."""
    out_chs: int       # c2
    c3: int
    c4: int
    num_blocks: int = 3
    act: str = "silu"
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.c3 // 2
        y0 = ConvNormLayerFuse(self.c3, 1, 1, act=self.act, deploy=self.deploy,
                               dtype=self.dtype, name="cv1")(x, train)
        y1, y2 = y0[..., :c], y0[..., c:]
        y3 = CSPLayer(self.c4, self.num_blocks, act=self.act, deploy=self.deploy,
                      dtype=self.dtype, name="cv2_csp")(y2, train)
        y3 = ConvNormLayerFuse(self.c4, 3, 1, act=self.act, deploy=self.deploy,
                               dtype=self.dtype, name="cv2_conv")(y3, train)
        y4 = CSPLayer(self.c4, self.num_blocks, act=self.act, deploy=self.deploy,
                      dtype=self.dtype, name="cv3_csp")(y3, train)
        y4 = ConvNormLayerFuse(self.c4, 3, 1, act=self.act, deploy=self.deploy,
                               dtype=self.dtype, name="cv3_conv")(y4, train)
        y = jnp.concatenate([y1, y2, y3, y4], axis=-1)
        return ConvNormLayerFuse(self.out_chs, 1, 1, act=self.act, deploy=self.deploy,
                                 dtype=self.dtype, name="cv4")(y, train)


class MLP(nn.Module):
    """Simple ReLU MLP head. Reference: src/models/detrpose/utils.py:75-87.

    ``zero_init_last`` reproduces the reference's zero-initialized final layer
    for prediction heads (transformer.py:1078-1084, 1113-1115, 269-271), which
    makes the initial predictions equal the anchors/references.
    """
    hidden_dim: int
    output_dim: int
    num_layers: int
    zero_init_last: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.output_dim if last else self.hidden_dim
            init = ({"kernel_init": nn.initializers.zeros}
                    if (last and self.zero_init_last) else {})
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}", **init)(x)
            if not last:
                x = jax.nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch_first) flax module.

    Packed qkv projection + out projection, 1/sqrt(d_head) scaling, additive
    float mask (or bool mask, True = disallowed).
    """
    d_model: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        d, h = self.d_model, self.num_heads
        dh = d // h
        qp = nn.Dense(d, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            return x.reshape(x.shape[:-1] + (h, dh)).swapaxes(-3, -2)  # (..., h, L, dh)

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = jnp.einsum("...hqd,...hkd->...hqk", qh, kh) / math.sqrt(dh)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                # Finite fill: a fully-masked row (e.g. unused static CDN slots)
                # must yield finite (uniform) weights, not NaN.
                logits = jnp.where(attn_mask, jnp.asarray(-1e9, logits.dtype), logits)
            else:
                logits = logits + attn_mask
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", w, vh)
        out = out.swapaxes(-3, -2).reshape(q.shape[:-1] + (d,))
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class Gate(nn.Module):
    """Gated residual fusion. Reference: transformer.py:222-235."""
    d_model: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        # zero init -> gates start at exactly 0.5 (transformer.py:226-228)
        g = nn.Dense(2 * self.d_model, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="gate")(
            jnp.concatenate([x1, x2], axis=-1)
        )
        g = jax.nn.sigmoid(g)
        g1, g2 = jnp.split(g, 2, axis=-1)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(g1 * x1 + g2 * x2)


class FastKANLayer(nn.Module):
    """RBF approximation of KAN edge-splines (reference: transformer.py:32-141).

    Experimental FFN variant (use_kan configs). x -> LN -> tanh grid coords ->
    Gaussian RBF basis -> einsum with per-(inner, dim) coefficients -> linear.
    """
    in_features: int
    out_features: int
    grid_size: int = 21
    sigma: float = 1.0
    use_layernorm: bool = True
    init_scale: float = 1e-2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        r = self.in_features // 2 + 1
        lead = x.shape[:-1]
        xf = x.reshape(-1, self.in_features)
        if self.use_layernorm:
            xf = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(xf)
        u = (jnp.tanh(xf) + 1.0) * 0.5 * (self.grid_size - 1)   # (N, D)
        centers = jnp.arange(self.grid_size, dtype=jnp.float32)
        diff = u[..., None] - centers                            # (N, D, G)
        basis = jnp.exp(-((diff / (self.sigma + 1e-12)) ** 2))
        coeffs = self.param(
            "coeffs", nn.initializers.normal(self.init_scale),
            (r, self.in_features, self.grid_size))
        s = jnp.einsum("bdg,rdg->br", basis, coeffs.astype(basis.dtype))
        out = nn.Dense(self.out_features, dtype=self.dtype, name="out_linear")(s)
        return out.reshape(lead + (self.out_features,))


class RMSNorm(nn.Module):
    """RMS normalisation. Reference: src/models/detrpose/utils.py:140-183."""
    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (y.astype(x.dtype)) * w.astype(x.dtype)

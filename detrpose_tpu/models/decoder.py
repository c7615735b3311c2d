"""Deformable pose decoder: MSDeformAttn, decoder layer, LQE, decoder stack.

Reference semantics: src/models/detrpose/transformer.py:263-925 and
ms_deform_attn.py:196-513 (default branch: no modulation / grid attention /
energy — those are config-gated extras, see transformer.py here for the flags).

Key reference subtlety reproduced exactly: ``with_pos_embed`` adds the keypoint
query position embedding *in place* (transformer.py:359-370), so the positional
term persists into the attention value, the residual stream, and the gateway
input. We replicate that functionally with ``x.at[:, :, 1:].add(pos)``.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import MLP, Gate, MultiHeadAttention, get_activation
from ..ops.ms_deform_attn import ms_deform_attn as _msda_core
from ..ops.grid_sample import bilinear_grid_sample

# Checkpoint the deformable gather with a named-save policy: only the
# bilinear result in its LANE-FULL (minor = nP*d_head = 128) layout is saved
# for backward (checkpoint_name in ops/ms_deform_attn.py). Without this the
# d_head=32-minor corner temporaries tile-pad 4x on TPU and blow training HBM
# (measured: un-checkpointed L bs8/640px wants 36.7G of 15.75G); with a plain
# jax.checkpoint the backward re-runs every gather. Eval/no-grad paths are
# unaffected (checkpoint only changes differentiation).
ms_deform_attn = jax.checkpoint(
    _msda_core,
    policy=jax.checkpoint_policies.save_only_these_names("msda_sampled"))
from ..ops.fdr import distance2pose, integral
from ..ops.misc import inverse_sigmoid
from ..ops.pos_embed import sine_embedding_2d


# Focal-style prior for classification bias (transformer.py:1074-1076).
_class_bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))


def _msda_offset_bias_init(n_heads: int, n_levels: int, n_points: int,
                           num_groups: int = 1):
    """Circle-pattern init of sampling-offset biases (ms_deform_attn.py:293-312).

    The reference zeroes the bias when n_points % 4 != 0 with a single group
    (e.g. the N model's dec_n_points=6); for num_groups>1 the circle pattern is
    tiled over the groups (ms_deform_attn.py:301-303).
    """
    if n_points % 4 != 0 and num_groups == 1:
        return nn.initializers.zeros
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (nH, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    # (nH, nL, nP, G, 2): layout matches the Dense output reshape
    # (B, Lq, nH, nL, nP, G, 2) used when G > 1.
    grid = np.tile(grid[:, None, None, None, :],
                   (1, n_levels, n_points, num_groups, 1))
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttn(nn.Module):
    """Multi-scale deformable cross-attention (default branch).

    Reference: ms_deform_attn.py:196-444. There is no value/output projection in
    the reference module — the concatenated weighted samples ARE the output.
    """
    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    # Experimental branches (reference defaults: all off, ms_deform_attn.py:197-211)
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
    # MSDA compute backend:
    #   "auto"   (default) — the separable-one-hot Pallas kernel on TPU
    #            (19.3 ms/call at L eval shapes, slope-measured), the XLA
    #            gather elsewhere (CPU tests, multichip dryrun).
    #   "gather" — XLA gather/one-hot dual path (168.7 ms/call on TPU v5e).
    #   "sep"    — force the separable kernel (ops/pallas/msda_sep.py).
    #   "pallas" — the older per-query fused kernel (251.7 ms/call; kept as
    #            a measured reference point, see tools/pallas_bench.py).
    msda_backend: str = "auto"
    dtype: Any = jnp.float32

    def _msda(self, value_levels, loc, aw):
        backend = self.msda_backend
        if backend == "auto":
            # The sep kernel is a forward-only win. Under differentiation
            # keep the checkpoint-policy-tuned gather path: the custom_vjp
            # would re-derive the gather vjp inside the backward AND detach
            # the named-save policy anchor — observed: the L bs8 train step
            # did not finish compiling in 30 min with sep, vs ~2 min with
            # gather. Detect differentiation by the tracer type at trace
            # time: grad/vjp trace with an AD tracer (JVPTracer on the
            # classic path, LinearizeTracer on jax's direct-linearize
            # path); plain jit eval traces with DynamicJaxprTracer only.
            from jax.interpreters import ad as _ad
            from jax._src.interpreters import ad as _ad_priv
            ad_tracers = tuple(
                t for t in (getattr(_ad, "JVPTracer", None),
                            getattr(_ad_priv, "JVPTracer", None),
                            getattr(_ad_priv, "LinearizeTracer", None))
                if t is not None)
            differentiating = any(
                isinstance(x, ad_tracers)
                for x in jax.tree.leaves((list(value_levels), loc, aw)))
            on_tpu = jax.default_backend() == "tpu"
            backend = "sep" if (on_tpu and not differentiating) else "gather"
        if backend == "sep":
            from ..ops.pallas.msda_sep import ms_deform_attn_fast

            return ms_deform_attn_fast(list(value_levels), loc, aw)
        if backend == "pallas":
            from ..ops.pallas.msda import ms_deform_attn_pallas

            return ms_deform_attn_pallas(value_levels, loc, aw)
        return ms_deform_attn(value_levels, loc, aw)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                 # (B, Lq, C)
        reference_points: jax.Array,      # (B, Lq, 2), normalized [0, 1]
        value_levels: Sequence[jax.Array],  # per level (B, H, W, nH, d_head)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        B, Lq, _ = query.shape
        nH, nL, nP = self.n_heads, self.n_levels, self.n_points

        # optional global-context conditioning (ms_deform_attn.py:369-382)
        if self.use_global_context:
            pooled = jnp.concatenate(
                [v.mean(axis=(1, 2, 3)) for v in value_levels], axis=-1)  # (B, dh*nL)
            ctx = nn.Dense(self.d_model, dtype=self.dtype, name="global_proj")(pooled)
            gate = jax.nn.sigmoid(
                nn.Dense(self.d_model, kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.constant(2.0),
                         dtype=self.dtype, name="global_gate")(query))
            query = query + gate * ctx[:, None, :]

        G = self.num_groups if self.use_grouped_offsets else 1
        nHG = nH * G

        offsets = nn.Dense(
            nH * nL * nP * 2 * G,
            kernel_init=nn.initializers.zeros,
            bias_init=_msda_offset_bias_init(nH, nL, nP, G),
            dtype=self.dtype, name="sampling_offsets",
        )(query)
        if G > 1:
            # (ms_deform_attn.py:386-388): per-group offsets, head-major order.
            offsets = offsets.reshape(B, Lq, nH, nL, nP, G, 2).transpose(
                0, 1, 2, 5, 3, 4, 6).reshape(B, Lq, nHG, nL, nP, 2)
        else:
            offsets = offsets.reshape(B, Lq, nH, nL, nP, 2)

        aw = nn.Dense(
            nH * nL * nP,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="attention_weights",
        )(query).reshape(B, Lq, nH, nL * nP)
        aw = jax.nn.softmax(aw.astype(jnp.float32), axis=-1).astype(query.dtype)
        aw = aw.reshape(B, Lq, nH, nL, nP)
        if G > 1:
            aw = jnp.repeat(aw[:, :, :, None], G, axis=3).reshape(B, Lq, nHG, nL, nP)

        # optional per-sample modulation (ms_deform_attn.py:398-409): the
        # modulated sample is value * sigmoid(LN(mod) + bias); since the core
        # reduction is linear, folding it into the attention weights is exact.
        if self.use_modulation:
            mod = nn.Dense(nH * nL * nP * G, use_bias=False,
                           kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="sampling_modulation",
                           )(query)
            if G > 1:
                mod = mod.reshape(B, Lq, nH, nL, nP, G).transpose(
                    0, 1, 2, 5, 3, 4).reshape(B, Lq, nHG, nL, nP)
            else:
                mod = mod.reshape(B, Lq, nH, nL, nP)
            mod = nn.LayerNorm(epsilon=1e-5, reduction_axes=(-2, -1),
                               feature_axes=(-2, -1), dtype=self.dtype,
                               name="mod_layernorm")(mod)
            mod_bias = self.param("mod_bias", nn.initializers.constant(2.0),
                                  (1, 1, nHG, nL, nP))
            aw = aw * jax.nn.sigmoid(mod + mod_bias)

        # grouped offsets split each head's channels into G sub-heads
        # (ms_deform_attn.py:427-436).
        if G > 1:
            value_levels = [
                v.reshape(v.shape[0], v.shape[1], v.shape[2], nHG, -1)
                for v in value_levels
            ]

        # optional region sampling: average-pool the value maps before the
        # bilinear gather (ms_deform_attn.py:168-170).
        if self.use_region_sampling and self.region_kernel_size > 1:
            k = self.region_kernel_size
            p = k // 2
            value_levels = [
                jnp.mean(
                    jnp.stack([
                        jnp.pad(v, [(0, 0), (p, p), (p, p), (0, 0), (0, 0)])[
                            :, i:i + v.shape[1], j:j + v.shape[2]]
                        for i in range(k) for j in range(k)
                    ]), axis=0)
                for v in value_levels
            ]

        # loc = ref + offset / (W_l, H_l)  (ms_deform_attn.py:412-416)
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32
        ).reshape(1, 1, 1, nL, 1, 2)
        loc = reference_points[:, :, None, None, None, :] + offsets / normalizer
        local_out = self._msda(value_levels, loc, aw)

        # optional coarse grid-attention branch (ms_deform_attn.py:446-510):
        # a fixed gs x gs grid of global sampling points per level, optionally
        # with predicted offsets, fused with the local branch.
        if self.use_grid_attention:
            Pg = self.grid_num_points
            gs = int(math.isqrt(Pg))
            assert gs * gs == Pg, "grid_num_points must be a perfect square"
            centers = (np.arange(gs, dtype=np.float32) + 0.5) / gs
            yy, xx = np.meshgrid(centers, centers, indexing="ij")
            base = jnp.asarray(
                np.stack([xx.reshape(-1), yy.reshape(-1)], -1))  # (Pg, 2)
            base = jnp.broadcast_to(
                base[None, None, None, None], (B, Lq, nHG, nL, Pg, 2))

            gaw = nn.Dense(
                nH * nL * Pg,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="grid_attention_weights",
            )(query).reshape(B, Lq, nH, nL * Pg)
            gaw = jax.nn.softmax(gaw.astype(jnp.float32), axis=-1).astype(query.dtype)
            gaw = gaw.reshape(B, Lq, nH, nL, Pg)
            if G > 1:
                gaw = jnp.repeat(gaw[:, :, :, None], G, axis=3).reshape(
                    B, Lq, nHG, nL, Pg)

            if self.use_grid_offsets:
                goff = nn.Dense(
                    nH * nL * Pg * 2 * G, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype, name="grid_offsets")(query)
                if G > 1:
                    goff = goff.reshape(B, Lq, nH, nL, Pg, G, 2).transpose(
                        0, 1, 2, 5, 3, 4, 6).reshape(B, Lq, nHG, nL, Pg, 2)
                else:
                    goff = goff.reshape(B, Lq, nH, nL, Pg, 2)
                grid_loc = base + goff / normalizer
            else:
                grid_loc = base
            grid_out = self._msda(value_levels, grid_loc, gaw)
            if self.use_grid_fusion:
                return nn.Dense(self.d_model, dtype=self.dtype,
                                name="grid_fuse_proj")(
                    jnp.concatenate([local_out, grid_out], axis=-1))
            return local_out + grid_out

        return local_out


class LQE(nn.Module):
    """Localization-Quality-Estimation head. Reference: transformer.py:263-288."""
    topk: int = 4
    hidden_dim: int = 256
    num_layers: int = 2
    num_body_points: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, scores: jax.Array, pred_poses: jax.Array, feat: jax.Array) -> jax.Array:
        # scores: (B, L, num_classes); pred_poses: (B, L, K, 2) in [0,1];
        # feat: (B, H, W, C) — the stride-8 encoder level.
        B, L = pred_poses.shape[:2]
        grid = 2.0 * pred_poses - 1.0
        sampled = bilinear_grid_sample(feat, grid)  # (B, L, K, C)
        topv = jax.lax.top_k(sampled, self.topk)[0]  # (B, L, K, topk)
        stat = jnp.concatenate([topv, topv.mean(axis=-1, keepdims=True)], axis=-1)
        q = MLP(self.hidden_dim, 1, self.num_layers, zero_init_last=True,
                dtype=self.dtype, name="reg_conf")(stat.reshape(B, L, -1))
        return scores + q


class DeformableDecoderLayer(nn.Module):
    """One decoder layer: within-instance MHSA over the 1+K tokens, across-
    instance MHSA over queries, deformable cross-attn, gated fusion, FFN.

    Reference: transformer.py:291-442 (default flags).
    """
    d_model: int = 256
    d_ffn: int = 1024
    activation: str = "relu"
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    # Experimental MSDeformAttn branches (all default-off, like the reference).
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
    msda_backend: str = "auto"
    # FastKAN FFN variant (reference: transformer.py:371-385, use_kan configs).
    use_kan: bool = False
    kan_grid: int = 3
    # Energy-head mode (reference: transformer.py:297-298, :327-329, :397-440):
    # the layer maps an (…, energy_in_dim) state to a scalar energy per token.
    is_energy: bool = False
    energy_in_dim: int = 68
    energy_out_dim: int = 1
    normalize_energy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,                   # (B, nq, 1+K, d)
        query_pos: jax.Array,             # (B, nq, K, d)
        reference_points: jax.Array,      # (B, nq, 1+K, 2)
        value_levels: Sequence[jax.Array],
        spatial_shapes: Sequence[Tuple[int, int]],
        attn_mask: Optional[jax.Array] = None,  # (nq, nq) bool, True = blocked
    ) -> jax.Array:
        if self.is_energy:
            tgt = nn.Dense(self.d_model, dtype=self.dtype, name="energy_expand")(tgt)
        B, nq, T, d = tgt.shape  # T = 1 + K

        # -- within-instance self-attention (pos added in place, see module doc)
        x = tgt.at[:, :, 1:].add(query_pos)
        xf = x.reshape(B * nq, T, d)
        a = MultiHeadAttention(self.d_model, self.n_heads, dtype=self.dtype,
                               name="within_attn")(xf, xf, xf)
        x = x + a.reshape(B, nq, T, d)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="within_norm")(x)

        # -- across-instance self-attention per token slot
        xt = x.transpose(0, 2, 1, 3).reshape(B * T, nq, d)
        a = MultiHeadAttention(self.d_model, self.n_heads, dtype=self.dtype,
                               name="across_attn")(xt, xt, xt, attn_mask)
        xt = xt + a
        xt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="across_norm")(xt)
        x = xt.reshape(B, T, nq, d).transpose(0, 2, 1, 3)

        # -- deformable cross-attention (pos added in place again)
        x = x.at[:, :, 1:].add(query_pos)
        q = x.reshape(B, nq * T, d)
        refs = reference_points.reshape(B, nq * T, 2)
        ca = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                          use_modulation=self.use_modulation,
                          use_region_sampling=self.use_region_sampling,
                          region_kernel_size=self.region_kernel_size,
                          use_global_context=self.use_global_context,
                          use_grouped_offsets=self.use_grouped_offsets,
                          num_groups=self.num_groups,
                          use_grid_attention=self.use_grid_attention,
                          grid_num_points=self.grid_num_points,
                          use_grid_offsets=self.use_grid_offsets,
                          use_grid_fusion=self.use_grid_fusion,
                          msda_backend=self.msda_backend,
                          dtype=self.dtype, name="cross_attn")(
            q, refs, value_levels, spatial_shapes)
        x = Gate(self.d_model, dtype=self.dtype, name="gateway")(
            x, ca.reshape(B, nq, T, d))

        # -- FFN (MLP or FastKAN; reference: transformer.py:371-385)
        if self.use_kan:
            from .layers import FastKANLayer

            ff = FastKANLayer(self.d_model, self.d_ffn, grid_size=self.kan_grid,
                              dtype=self.dtype, name="kan1")(x)
            ff = jax.nn.relu(ff)
            ff = FastKANLayer(self.d_ffn, self.d_ffn, grid_size=self.kan_grid,
                              dtype=self.dtype, name="kan2")(ff)
            ff = nn.Dense(self.d_model, dtype=self.dtype, name="out_linear")(ff)
        else:
            ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(x)
            ff = get_activation(self.activation)(ff)
            ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + ff)
        if self.is_energy:
            if self.normalize_energy:
                from .layers import RMSNorm

                x = RMSNorm(self.d_model, dtype=self.dtype, name="input_n_energy")(x)
            x = nn.Dense(self.energy_out_dim, use_bias=False, dtype=self.dtype,
                         name="energy_reduce")(x)
        return x


def _mlp_apply(params, x, num_layers, dtype):
    """Functionally apply an MLP (layers.MLP param layout) given its params.

    Used to share the ref-point / pre-pose heads across the scanned decoder
    layers (reference shares one head instance, transformer.py:480): the params
    are materialized once in the decoder scope and passed into the nn.scan body
    as broadcast inputs, so they are NOT stacked per layer and receive summed
    gradients from all layers — exactly like the reference's shared module.
    """
    x = x.astype(dtype)
    for i in range(num_layers):
        p = params[f"layers_{i}"]
        x = x @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)
        if i < num_layers - 1:
            x = jax.nn.relu(x)
    return x


class _DecoderStep(nn.Module):
    """One scanned decoder iteration: layer body + FDR/class/LQE heads.

    All per-layer parameters live under this module and get a leading
    ``num_layers`` axis from ``nn.scan`` (variable_axes={'params': 0}) —
    a single trace/compile of the layer regardless of depth. The reference
    unrolls a Python loop over 6 layer modules (transformer.py:588); on
    TPU/XLA that multiplies compile time ~6x for zero runtime benefit.
    """
    hidden_dim: int
    num_body_points: int
    d_ffn: int
    activation: str
    n_levels: int
    n_heads: int
    n_points: int
    num_classes: int
    reg_max: int
    reg_scale: float
    lqe_topk: int
    lqe_hidden: int
    lqe_layers: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    train: bool
    # experimental branches (see DeformableDecoderLayer)
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
    msda_backend: str = "auto"
    use_kan: bool = False
    kan_grid: int = 3
    dtype: Any = jnp.float32
    # False only on unrolled-eval intermediate layers (heads skipped; the
    # param tree is defined by the nn.scan/train path, unused leaves are fine)
    compute_heads: bool = True

    @nn.compact
    def __call__(self, carry, idx, value_levels, feat_lqe, project, attn_mask,
                 ref_head_p, pre_head_p):
        (out, refpoint_pose, output_pose_detach, pred_corners_undetach,
         ref_pose_initial, pre_poses, pre_scores, _qp, _lr) = carry
        K = self.num_body_points
        is_first = idx == 0

        layer_ref = refpoint_pose
        ref_only_pose = refpoint_pose[:, :, 1:]          # (B, nq, K, 2)
        sine = sine_embedding_2d(ref_only_pose, self.hidden_dim).astype(out.dtype)
        query_pos = _mlp_apply(ref_head_p, sine, 2, self.dtype)

        out = DeformableDecoderLayer(
            self.hidden_dim, self.d_ffn, self.activation, self.n_levels,
            self.n_heads, self.n_points,
            use_modulation=self.use_modulation,
            use_region_sampling=self.use_region_sampling,
            region_kernel_size=self.region_kernel_size,
            use_global_context=self.use_global_context,
            use_grouped_offsets=self.use_grouped_offsets,
            num_groups=self.num_groups,
            use_grid_attention=self.use_grid_attention,
            grid_num_points=self.grid_num_points,
            use_grid_offsets=self.use_grid_offsets,
            use_grid_fusion=self.use_grid_fusion,
            msda_backend=self.msda_backend,
            use_kan=self.use_kan, kan_grid=self.kan_grid,
            dtype=self.dtype, name="layer",
        )(out, query_pos, refpoint_pose, value_levels, self.spatial_shapes,
          attn_mask)

        output_pose = out[:, :, 1:]      # (B, nq, K, d)
        output_instance = out[:, :, 0]   # (B, nq, d)

        # layer-0 conventional head (transformer.py:703-709); computed every
        # iteration (uniform scan body) but only iteration 0's value is kept.
        pre = _mlp_apply(pre_head_p, output_pose, 3, self.dtype)
        # keypoint positions stay f32 regardless of compute dtype (carry
        # components must be dtype-stable across scan iterations)
        pre_pose_i = jax.nn.sigmoid(
            pre + inverse_sigmoid(ref_only_pose)).astype(jnp.float32)
        ref_pose_initial = jnp.where(
            is_first, jax.lax.stop_gradient(pre_pose_i), ref_pose_initial)
        pre_poses = jnp.where(is_first, pre_pose_i, pre_poses)

        corners = MLP(self.hidden_dim, 2 * (self.reg_max + 1), 3,
                      zero_init_last=True, dtype=self.dtype, name="pose_head")(
            output_pose + output_pose_detach) + pred_corners_undetach
        kpts = distance2pose(ref_pose_initial, integral(corners, project),
                             self.reg_scale)             # (B, nq, K, 2)
        center = jnp.mean(kpts, axis=2, keepdims=True)
        new_refpoint = jnp.concatenate([center, kpts], axis=2)

        if self.compute_heads:
            score = nn.Dense(self.num_classes, bias_init=_class_bias_init,
                             dtype=self.dtype, name="class_head")(output_instance)
            pre_scores = jnp.where(is_first, score, pre_scores)
            logit = LQE(self.lqe_topk, self.lqe_hidden, self.lqe_layers, K,
                        dtype=self.dtype, name="lqe_head")(score, kpts, feat_lqe)
        else:
            # unrolled-eval intermediate layer: class/LQE heads are only
            # needed on the final layer (reference eval short-circuit,
            # transformer.py:726,907-908)
            logit = jnp.zeros((out.shape[0], out.shape[1], self.num_classes),
                              out.dtype)

        # inter-layer detaches (transformer.py:910-916); identity at eval.
        new_carry = (
            out,
            jax.lax.stop_gradient(new_refpoint) if self.train else new_refpoint,
            jax.lax.stop_gradient(output_pose) if self.train else output_pose,
            corners,
            ref_pose_initial,
            pre_poses,
            pre_scores,
            query_pos,     # final layer's query_pos / input refs, for the
            layer_ref,     # optional post-scan energy refinement
        )
        return new_carry, (kpts, logit, corners)


class TransformerDecoder(nn.Module):
    """Decoder stack with FDR iterative keypoint refinement.

    Reference: transformer.py:446-925. The identical per-layer modules are run
    under a single ``nn.scan`` (stacked params, one compiled layer body) — a
    TPU-first restructure of the reference's unrolled module list. Training
    uses all stacked per-layer outputs for deep supervision; eval takes the
    final slice (the reference short-circuits early, same result).
    """
    num_layers: int = 6
    hidden_dim: int = 256
    num_body_points: int = 17
    d_ffn: int = 1024
    activation: str = "relu"
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    num_classes: int = 2
    reg_max: int = 32
    reg_scale: float = 4.0
    lqe_topk: int = 4
    lqe_hidden: int = 256
    lqe_layers: int = 2
    # Experimental layer branches (config-gated, off in canonical zoo models).
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
    msda_backend: str = "auto"
    use_kan: bool = False
    kan_grid: int = 3
    remat: bool = False  # jax.checkpoint each decoder layer
    # Training runs the layer stack under lax.scan (stacked params, one
    # compiled layer body). scan_layers=False additionally offers an unrolled
    # training path over sliced stacked params; measured on this TPU runtime
    # its backward (6 dynamic-slice reads per stacked param) compiles
    # pathologically slowly, so scan stays the training default. Eval always
    # unrolls (no backward — XLA fuses across layers, final-layer-only heads).
    scan_layers: bool = True
    scan_unroll: int = 1
    # Experimental energy-based refinement (reference: transformer.py:731-901,
    # config-gated, off in all canonical zoo models). jax.grad replaces the
    # reference's eval-time torch.autograd.grad (engine.py:133).
    use_energy_refinement: bool = False
    energy_steps: int = 3
    energy_step_size: float = 0.1
    grad_energy: bool = False
    energy_decrease_weight: float = 0.0
    normalize_energy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,                   # (B, nq, 1+K, d)
        refpoints_sigmoid: jax.Array,     # (B, nq, 1+K, 2)
        value_levels: Sequence[jax.Array],
        spatial_shapes: Sequence[Tuple[int, int]],
        feat_lqe: jax.Array,              # (B, H8, W8, C)
        project: jax.Array,               # (reg_max+1,) W(n)
        attn_mask: Optional[jax.Array] = None,
        train: bool = False,
    ):
        K = self.num_body_points
        B, nq = tgt.shape[:2]
        d = self.hidden_dim
        L = self.num_layers

        # Shared heads (reference: single instances used by every layer,
        # transformer.py:480, :703): materialize their params in THIS scope
        # (the dummy calls are dead code XLA removes), then pass the param
        # subtrees into the scan body as broadcast inputs.
        ref_point_head = MLP(self.hidden_dim, self.hidden_dim, 2,
                             dtype=self.dtype, name="half_pose_ref_point_head")
        pre_pose_head = MLP(self.hidden_dim, 2, 3, zero_init_last=True,
                            dtype=self.dtype, name="pre_pose_head")
        _ = ref_point_head(jnp.zeros((1, 1, d), self.dtype))
        _ = pre_pose_head(jnp.zeros((1, 1, d), self.dtype))
        own = self.variables["params"]
        ref_head_p = own["half_pose_ref_point_head"]
        pre_head_p = own["pre_pose_head"]

        step_kwargs = dict(
            hidden_dim=self.hidden_dim, num_body_points=K, d_ffn=self.d_ffn,
            activation=self.activation, n_levels=self.n_levels,
            n_heads=self.n_heads, n_points=self.n_points,
            num_classes=self.num_classes, reg_max=self.reg_max,
            reg_scale=self.reg_scale, lqe_topk=self.lqe_topk,
            lqe_hidden=self.lqe_hidden, lqe_layers=self.lqe_layers,
            spatial_shapes=tuple(tuple(s) for s in spatial_shapes), train=train,
            use_modulation=self.use_modulation,
            use_region_sampling=self.use_region_sampling,
            region_kernel_size=self.region_kernel_size,
            use_global_context=self.use_global_context,
            use_grouped_offsets=self.use_grouped_offsets,
            num_groups=self.num_groups,
            use_grid_attention=self.use_grid_attention,
            grid_num_points=self.grid_num_points,
            use_grid_offsets=self.use_grid_offsets,
            use_grid_fusion=self.use_grid_fusion,
            msda_backend=self.msda_backend,
            use_kan=self.use_kan, kan_grid=self.kan_grid,
            dtype=self.dtype,
        )
        StepCls = (nn.remat(_DecoderStep, prevent_cse=False)
                   if self.remat else _DecoderStep)
        ScanStep = nn.scan(
            StepCls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0,) + (nn.broadcast,) * 6,
            out_axes=0,
            length=L,
            # unroll > 1 replicates the body inside the loop (static param
            # slices, fewer loop iterations). Measured on v5e: no step-time
            # gain for the L train step (56 ms at unroll=6 vs 44-55 at 1) —
            # the step is bound by the gathers + their checkpointed recompute,
            # not loop overhead — so 1 (minimum compile time) is the default.
            unroll=min(self.scan_unroll, L),
        )

        zeros_pose = jnp.zeros((B, nq, K, 2), jnp.float32)
        # positions are carried in f32 regardless of the compute dtype
        refs_f32 = refpoints_sigmoid.astype(jnp.float32)
        init_carry = (
            tgt,                                         # decoder tokens
            refs_f32,                                    # refpoint_pose
            jnp.zeros((B, nq, K, d), tgt.dtype),         # output_pose_detach
            jnp.zeros((B, nq, K, 2 * (self.reg_max + 1)), tgt.dtype),
            zeros_pose,                                  # ref_pose_initial
            zeros_pose,                                  # pre_poses
            jnp.zeros((B, nq, self.num_classes), tgt.dtype),  # pre_scores
            jnp.zeros((B, nq, K, d), tgt.dtype),         # last query_pos
            refs_f32,                                    # last layer_ref
        )
        if self.is_initializing() or (train and self.scan_layers):
            carry, (dec_poses, dec_logits, dec_corners) = ScanStep(
                **step_kwargs, name="dec_scan")(
                init_carry, jnp.arange(L), value_levels, feat_lqe, project,
                attn_mask, ref_head_p, pre_head_p)
        else:
            # Unrolled execution over the SAME stacked params: slice each
            # leaf's leading layer axis and apply the step functionally. XLA
            # then fuses across layer boundaries — the scan pins the carry to
            # HBM every iteration (measured: 30% eval throughput, >2x train
            # step time) — so unrolled is the production default; the scan
            # path exists for compile-time-bound environments (the CPU
            # multi-chip dryrun compiles one layer body instead of six).
            # At eval, class/LQE heads run only on the final layer (reference
            # short-circuit, transformer.py:726,907-908).
            stacked = self.variables["params"]["dec_scan"]
            mid = _DecoderStep(**step_kwargs,
                               compute_heads=train, parent=None)
            last = _DecoderStep(**step_kwargs, compute_heads=True, parent=None)
            carry = init_carry
            ys = []
            for i in range(L):
                p_i = jax.tree.map(lambda x: x[i], stacked)
                mod = last if i == L - 1 else mid
                apply_fn = mod.apply
                if self.remat and train:
                    apply_fn = jax.checkpoint(mod.apply, prevent_cse=False)
                carry, y = apply_fn(
                    {"params": p_i}, carry, jnp.asarray(i, jnp.int32),
                    value_levels, feat_lqe, project, attn_mask,
                    ref_head_p, pre_head_p)
                ys.append(y)
            if train:
                # stacked per-layer outputs for deep supervision
                dec_poses, dec_logits, dec_corners = (
                    jnp.stack(z) for z in zip(*ys))
            else:
                # 1-element stacks (callers consume [-1]; reference eval
                # appends only the final layer too)
                dec_poses, dec_logits, dec_corners = (z[None] for z in ys[-1])
        (_, _, _, _, ref_pose_initial, pre_poses, pre_scores,
         last_query_pos, last_layer_ref) = carry

        energy_reg = jnp.zeros((), jnp.float32)
        # -- experimental energy-based refinement on the final layer's outputs
        if self.use_energy_refinement:
            corners, kpts, logit, energy_reg = self._energy_refine(
                dec_corners[-1], dec_poses[-1], dec_logits[-1],
                last_query_pos, last_layer_ref,
                value_levels, spatial_shapes, attn_mask)
            dec_corners = dec_corners.at[-1].set(corners)
            dec_poses = dec_poses.at[-1].set(kpts)
            dec_logits = dec_logits.at[-1].set(logit)

        # dec_refs: the reference appends the (constant after layer 0)
        # ref_pose_initial once per layer (transformer.py:722).
        dec_refs = jnp.broadcast_to(
            ref_pose_initial[None],
            (dec_poses.shape[0],) + ref_pose_initial.shape)

        return (
            dec_poses,                # (L, B, nq, K, 2)
            dec_logits,               # (L, B, nq, num_classes)
            dec_corners,              # (L, B, nq, K, 2*(reg_max+1))
            dec_refs,                 # (L, B, nq, K, 2)
            pre_poses,                # (B, nq, K, 2)
            pre_scores,               # (B, nq, num_classes)
            energy_reg,               # scalar regulariser (0 unless energy mode)
        )

    def _energy_refine(self, corners, kpts, logit, query_pos, layer_ref,
                       value_levels, spatial_shapes, attn_mask):
        """Gradient-descent refinement on an energy landscape.

        Reference: transformer.py:731-901. The refinement state z packs the FDR
        corner logits + keypoints per keypoint token plus a tiled logit row;
        an is_energy decoder layer maps z to per-token energies; z descends
        either the energy's gradient (grad_energy) or the raw energy. The
        reference's eval-time torch.autograd.grad is jax.grad here — no special
        eval mode needed.
        """
        B, nq, K, nc = corners.shape
        C = logit.shape[-1]
        zdim = nc + 2
        z_pose = jnp.concatenate([corners, kpts], axis=-1)        # (B, nq, K, zdim)
        z_logit = jnp.tile(logit[..., None, :], (1, 1, 1, zdim // C))
        z = jnp.concatenate([z_pose, z_logit], axis=-2)           # (B, nq, K+1, zdim)

        energy_layer = DeformableDecoderLayer(
            self.hidden_dim, self.d_ffn, self.activation, self.n_levels,
            self.n_heads, self.n_points, is_energy=True, energy_in_dim=zdim,
            energy_out_dim=1, normalize_energy=self.normalize_energy,
            dtype=self.dtype, name="energy_layer")

        step_size = self.param(
            "energy_step_size",
            nn.initializers.constant(self.energy_step_size), (1,))
        lam = self.energy_decrease_weight

        def e_mean(zz):
            E = energy_layer(zz, query_pos, layer_ref, value_levels,
                             spatial_shapes, attn_mask)
            return E.reshape(E.shape[0], -1).mean(1)

        reg = jnp.zeros((), jnp.float32)
        e_prev = None
        for _ in range(self.energy_steps):
            E_raw = energy_layer(z, query_pos, layer_ref, value_levels,
                                 spatial_shapes, attn_mask)
            e_safe = E_raw.reshape(E_raw.shape[0], -1).mean(1)
            if e_prev is not None and lam > 0:
                reg = reg + lam * jax.nn.relu(
                    e_safe - jax.lax.stop_gradient(e_prev)).mean()
            e_prev = e_safe
            if self.grad_energy:
                g = jax.grad(lambda zz: e_mean(zz).sum())(z)
                z = z - step_size * g
            else:
                z = z - step_size * E_raw

        corners = z[..., :-1, :nc]
        kpts = z[..., :-1, nc:]
        logit = z[..., -1, 0:C]
        return corners, kpts, logit, reg

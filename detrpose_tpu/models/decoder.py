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
from ..ops.ms_deform_attn import ms_deform_attn
from ..ops.grid_sample import bilinear_grid_sample
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
    dtype: Any = jnp.float32

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
        local_out = ms_deform_attn(value_levels, loc, aw)

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
            grid_out = ms_deform_attn(value_levels, grid_loc, gaw)
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


class TransformerDecoder(nn.Module):
    """Decoder stack with FDR iterative keypoint refinement.

    Reference: transformer.py:446-925. Training returns per-layer outputs for
    deep supervision; eval short-circuits to the final layer's heads.
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
    use_kan: bool = False
    kan_grid: int = 3
    remat: bool = False  # jax.checkpoint each decoder layer
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
        out = tgt
        refpoint_pose = refpoints_sigmoid
        output_pose_detach = 0.0
        pred_corners_undetach = 0.0
        ref_pose_initial = None
        pre_poses = pre_scores = None

        dec_poses, dec_logits, dec_corners, dec_refs = [], [], [], []

        # Shared across layers (reference: one head, transformer.py:480).
        ref_point_head = MLP(self.hidden_dim, self.hidden_dim, 2, dtype=self.dtype,
                             name="half_pose_ref_point_head")

        eval_idx = self.num_layers - 1
        energy_reg = jnp.zeros((), jnp.float32)
        LayerCls = (nn.remat(DeformableDecoderLayer, static_argnums=(5,))
                    if self.remat else DeformableDecoderLayer)
        for layer_id in range(self.num_layers):
            layer_ref = refpoint_pose   # reference points fed to this layer
            ref_only_pose = refpoint_pose[:, :, 1:]  # (B, nq, K, 2)
            sine = sine_embedding_2d(ref_only_pose, self.hidden_dim).astype(out.dtype)
            query_pos = ref_point_head(sine)

            out = LayerCls(
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
                use_kan=self.use_kan, kan_grid=self.kan_grid,
                dtype=self.dtype,
                name=f"layers_{layer_id}",
            )(out, query_pos, refpoint_pose, value_levels, spatial_shapes, attn_mask)

            output_pose = out[:, :, 1:]      # (B, nq, K, d)
            output_instance = out[:, :, 0]   # (B, nq, d)

            if layer_id == 0:
                pre = MLP(self.hidden_dim, 2, 3, zero_init_last=True,
                          dtype=self.dtype, name="pre_pose_head")(output_pose)
                pre_poses = jax.nn.sigmoid(pre + inverse_sigmoid(ref_only_pose))
                pre_scores = nn.Dense(
                    self.num_classes, bias_init=_class_bias_init,
                    dtype=self.dtype, name="class_head_0")(output_instance)
                ref_pose_initial = jax.lax.stop_gradient(pre_poses)

            corners = MLP(self.hidden_dim, 2 * (self.reg_max + 1), 3,
                          zero_init_last=True,
                          dtype=self.dtype, name=f"pose_head_{layer_id}")(
                output_pose + output_pose_detach) + pred_corners_undetach
            kpts = distance2pose(ref_pose_initial, integral(corners, project),
                                 self.reg_scale)           # (B, nq, K, 2)
            center = jnp.mean(kpts, axis=2, keepdims=True)
            refpoint_pose = jnp.concatenate([center, kpts], axis=2)

            if train or layer_id == eval_idx:
                if layer_id == 0:
                    score = pre_scores
                else:
                    score = nn.Dense(
                        self.num_classes, bias_init=_class_bias_init,
                        dtype=self.dtype, name=f"class_head_{layer_id}")(output_instance)
                logit = LQE(self.lqe_topk, self.lqe_hidden, self.lqe_layers, K,
                            dtype=self.dtype, name=f"lqe_head_{layer_id}")(
                    score, kpts, feat_lqe)

                # -- experimental energy-based refinement on the final layer
                if self.use_energy_refinement and layer_id == self.num_layers - 1:
                    corners, kpts, logit, energy_reg = self._energy_refine(
                        corners, kpts, logit, query_pos, layer_ref,
                        value_levels, spatial_shapes, attn_mask)

                dec_logits.append(logit)
                dec_poses.append(kpts)
                dec_corners.append(corners)
                dec_refs.append(ref_pose_initial)
                if not train:
                    break

            pred_corners_undetach = corners
            if train:
                refpoint_pose = jax.lax.stop_gradient(refpoint_pose)
                output_pose_detach = jax.lax.stop_gradient(output_pose)
            else:
                output_pose_detach = output_pose

        return (
            jnp.stack(dec_poses),     # (L', B, nq, K, 2)
            jnp.stack(dec_logits),    # (L', B, nq, num_classes)
            jnp.stack(dec_corners),   # (L', B, nq, K, 2*(reg_max+1))
            jnp.stack(dec_refs),      # (L', B, nq, K, 2)
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

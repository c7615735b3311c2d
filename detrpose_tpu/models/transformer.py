"""Transformer top module: memory prep, two-stage query selection, CDN concat,
decoder invocation, output packing.

Reference semantics: src/models/detrpose/transformer.py:929-1420. Anchors and
the valid mask are trace-time constants at a fixed resolution (matching the
reference's eval buffers, transformer.py:1130-1133); at other traced
resolutions they are recomputed, matching the training path (:1219-1222).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import MLP
from .decoder import TransformerDecoder
from ..ops.fdr import weighting_function


def make_anchors(spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-pixel anchor logits + invalid mask (transformer.py:1179-1200).

    Returns:
      anchors: (1, S, 2) logit-space anchor centers.
      invalid: (1, S, 1) bool, True where the anchor is outside (0.01, 0.99).
    """
    all_anchors = []
    for (H, W) in spatial_shapes:
        gy, gx = np.meshgrid(
            np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        grid = np.stack([gx, gy], -1)  # (H, W, 2)
        grid = (grid + 0.5) / np.array([W, H], dtype=np.float32)
        all_anchors.append(grid.reshape(-1, 2))
    anchors = np.concatenate(all_anchors, 0)[None]  # (1, S, 2)
    valid = ((anchors > 0.01) & (anchors < 0.99)).all(-1, keepdims=True)
    logits = np.log(anchors / (1 - anchors))
    return jnp.asarray(logits), jnp.asarray(~valid)


class Transformer(nn.Module):
    """Reference: transformer.py:929-1420 (default two_stage_type='standard')."""
    hidden_dim: int = 256
    nhead: int = 8
    num_queries: int = 60
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    activation: str = "relu"
    num_feature_levels: int = 3
    dec_n_points: int = 4
    num_classes: int = 2
    num_body_points: int = 17
    reg_max: int = 32
    reg_scale: float = 4.0
    up: float = 0.5
    # experimental decoder-layer branches (see decoder.DeformableDecoderLayer)
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
    remat: bool = False
    scan_layers: bool = True
    scan_unroll: int = 1
    # experimental energy refinement (see decoder.TransformerDecoder)
    use_energy_refinement: bool = False
    energy_steps: int = 3
    energy_step_size: float = 0.1
    grad_energy: bool = False
    energy_decrease_weight: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: List[jax.Array],           # per level NHWC (B, H, W, hidden)
        train: bool = False,
        dn: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, Any]:
        K = self.num_body_points
        hd = self.hidden_dim
        nq = self.num_queries
        B = feats[0].shape[0]
        spatial_shapes = [(f.shape[1], f.shape[2]) for f in feats]

        # -- flatten pyramid to memory (B, S, C)
        memory = jnp.concatenate([f.reshape(B, -1, hd) for f in feats], axis=1)
        anchors, invalid_mask = make_anchors(spatial_shapes)
        output_memory = jnp.where(invalid_mask, 0.0, memory)

        # -- two-stage query selection
        output_memory = nn.Dense(hd, dtype=self.dtype, name="enc_output")(output_memory)
        output_memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="enc_output_norm")(output_memory)
        enc_class = nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(-np.log((1 - 0.01) / 0.01)),
            dtype=self.dtype, name="enc_out_class_embed",
        )(output_memory)  # (B, S, num_classes)
        assert memory.shape[1] >= nq, (
            f"input too small: {memory.shape[1]} anchors < num_queries={nq}; "
            f"increase resolution (min {int(np.ceil(np.sqrt(nq)))}x the coarsest stride)")
        topk_idx = jax.lax.top_k(enc_class.max(-1), nq)[1]  # (B, nq)

        topk_memory = jnp.take_along_axis(output_memory, topk_idx[..., None], axis=1)
        topk_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (B,) + anchors.shape[1:]),
            topk_idx[..., None], axis=1)  # (B, nq, 2)

        delta = MLP(2 * hd, 2 * K, 4, zero_init_last=True, dtype=self.dtype,
                    name="enc_pose_embed")(topk_memory).reshape(B, nq, K, 2)
        enc_pose_coord = jax.nn.sigmoid(delta + topk_anchors[:, :, None, :])
        enc_center = jnp.mean(enc_pose_coord, axis=2, keepdims=True)
        enc_pose_full = jnp.concatenate([enc_center, enc_pose_coord], axis=2)
        refpoints = jax.lax.stop_gradient(enc_pose_full)  # (B, nq, 1+K, 2)

        interm_class = (
            jnp.take_along_axis(enc_class, topk_idx[..., None], axis=1) if train else None
        )

        # -- query construction: learnable content + shared keypoint/instance priors
        # Reference xavier-uniforms every >1D param incl. embeddings
        # (transformer.py:1149-1152).
        xavier = nn.initializers.xavier_uniform()
        tgt_embed = self.param("tgt_embed", xavier, (nq, hd))
        keypoint_embedding = self.param("keypoint_embedding", xavier, (K, hd))
        instance_embedding = self.param("instance_embedding", xavier, (1, hd))
        # CDN denoising embeddings (train path; reference: transformer.py:1057-1058).
        label_enc = self.param("label_enc", xavier, (80 + 1, hd))
        pose_enc = self.param("pose_enc", xavier, (K, hd))
        tgt = jnp.broadcast_to(tgt_embed[None, :, None, :], (B, nq, 1, hd))
        tgt_pose = keypoint_embedding[None, None] + tgt           # (B, nq, K, hd)
        tgt_global = jnp.broadcast_to(instance_embedding[None, None], (B, nq, 1, hd))
        tgt_tokens = jnp.concatenate([tgt_global, tgt_pose], axis=2).astype(self.dtype)

        # -- denoising queries (training; noise built host-side in train/cdn.py,
        #    embeddings looked up in-graph so label_enc/pose_enc receive grads)
        attn_mask = None
        if train and dn is not None:
            pad = dn["labels"].shape[1]
            lab = jnp.take(label_enc, dn["labels"], axis=0)       # (B, pad, hd)
            pose_tok = jnp.broadcast_to(pose_enc[None, None], (B, pad, K, hd))
            dn_tokens = jnp.concatenate([lab[:, :, None], pose_tok], axis=2)
            if "slot_used" in dn:
                # unused slots carry ZERO content embeddings (reference
                # padding_label zeros, dn_component.py:141-148) — they are
                # visible to their group's real slots in across-instance attn.
                dn_tokens = jnp.where(
                    dn["slot_used"][:, :, None, None], dn_tokens, 0.0)
            tgt_tokens = jnp.concatenate([dn_tokens.astype(self.dtype), tgt_tokens], axis=1)
            refpoints = jnp.concatenate(
                [jax.nn.sigmoid(dn["pose_logits"]), refpoints], axis=1)
            attn_mask = dn["attn_mask"]

        # -- value prep: per-level per-head views of the (unmasked) memory
        dh = hd // self.nhead
        value_levels = [
            f.reshape(B, f.shape[1], f.shape[2], self.nhead, dh) for f in feats
        ]

        project = weighting_function(self.reg_max, self.up, self.reg_scale)

        (out_poses, out_logits, out_corners, out_refs, pre_poses, pre_scores,
         energy_reg) = (
            TransformerDecoder(
                num_layers=self.num_decoder_layers,
                hidden_dim=hd,
                num_body_points=K,
                d_ffn=self.dim_feedforward,
                activation=self.activation,
                n_levels=self.num_feature_levels,
                n_heads=self.nhead,
                n_points=self.dec_n_points,
                num_classes=self.num_classes,
                reg_max=self.reg_max,
                reg_scale=self.reg_scale,
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
                remat=self.remat,
                scan_layers=self.scan_layers,
                scan_unroll=self.scan_unroll,
                use_energy_refinement=self.use_energy_refinement,
                energy_steps=self.energy_steps,
                energy_step_size=self.energy_step_size,
                grad_energy=self.grad_energy,
                energy_decrease_weight=self.energy_decrease_weight,
                dtype=self.dtype,
                name="decoder",
            )(tgt_tokens, refpoints, value_levels, spatial_shapes, feats[0],
              project, attn_mask, train)
        )

        if not train:
            return {
                "pred_logits": out_logits[-1],
                "pred_keypoints": out_poses[-1].reshape(B, nq, 2 * K),
            }

        # -- split DN block from real queries, pack deep-supervision outputs
        # (pad is the static DN slot capacity, from the array shape)
        pad = dn["labels"].shape[1] if dn is not None else 0
        flat_poses = out_poses.reshape(out_poses.shape[:3] + (2 * K,))
        pre_flat = pre_poses.reshape(B, -1, 2 * K)

        def split(x, axis):
            if pad == 0:
                return None, x
            return jnp.split(x, [pad], axis=axis)

        dn_poses, poses = split(flat_poses, 2)
        dn_logits, logits = split(out_logits, 2)
        dn_corners, corners = split(out_corners, 2)
        dn_refs, refs = split(out_refs, 2)
        dn_pre_poses, pre_poses_r = split(pre_flat, 1)
        dn_pre_scores, pre_scores_r = split(pre_scores, 1)

        out = {
            "pred_logits": logits[-1],
            "pred_keypoints": poses[-1],
            "energy_reg_loss": energy_reg,
            "pred_corners": corners[-1],
            "ref_points": refs[-1],
            "up": self.up,
            "reg_scale": self.reg_scale,
            "reg_max": self.reg_max,
            "aux_outputs": [
                {
                    "pred_logits": logits[i],
                    "pred_keypoints": poses[i],
                    "pred_corners": corners[i],
                    "ref_points": refs[i],
                    "teacher_corners": corners[-1],
                    "teacher_logits": logits[-1],
                }
                for i in range(self.num_decoder_layers - 1)
            ],
            "aux_interm_outputs": [{
                "pred_logits": interm_class,
                "pred_keypoints": enc_pose_coord.reshape(B, nq, 2 * K),
            }],
            "aux_pre_outputs": {
                "pred_logits": pre_scores_r,
                "pred_keypoints": pre_poses_r,
            },
        }
        if pad:
            out["dn_aux_outputs"] = [
                {
                    "pred_logits": dn_logits[i],
                    "pred_keypoints": dn_poses[i],
                    "pred_corners": dn_corners[i],
                    "ref_points": dn_refs[i],
                    "teacher_corners": dn_corners[-1],
                    "teacher_logits": dn_logits[-1],
                    "is_dn": True,
                }
                for i in range(self.num_decoder_layers)
            ]
            out["dn_aux_pre_outputs"] = {
                "pred_logits": dn_pre_scores,
                "pred_keypoints": dn_pre_poses,
            }
            out["dn_meta"] = {
                "pad_size": pad,
                "num_dn_group": dn["dn_match"]["num_group"],
            }
        return out

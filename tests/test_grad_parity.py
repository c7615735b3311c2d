"""Gradient parity: the full training backward vs the torch reference.

This is the round-3 north-star derisk (VERDICT r2 #1): forward criterion values
were already golden (test_criterion_golden), but training consumes *gradients*
— a wrong stop_gradient/detach placement (models/decoder.py inter-layer
detaches vs reference transformer.py:910-916), a dn branch wiring bug, or a
missed in-place pos-embed subtlety would pass every forward test and silently
train to a worse model. (This test's first casualty: round 2's CDN padded
unused slots with label_enc(0) instead of the reference's zero embeddings.)

The single-step check is STAGE-WISE (see its docstring for why a naive
end-to-end comparison is chaotic at random init); the 20-step trajectory test
then runs both full production training loops on synced data. Shared CDN
noise: our host-side train/cdn.build_cdn generates the noise, and the
reference's prepare_for_cdn (src/models/detrpose/dn_component.py:39-183) is
replaced by a shim that replays exactly that noise in the reference's
dynamic-pad layout (this also bypasses its hard .cuda() calls). The matcher is
scipy on both sides, so assignments agree given matching costs.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from detrpose_tpu.configs import build_model
from detrpose_tpu.train.cdn import build_cdn
from detrpose_tpu.train.criterion import criterion as our_criterion
from detrpose_tpu.utils.convert import convert_state_dict

from ref_loader import build_reference_model, _ns_pkg, REF

K = 17
C = 2
HW = 128
B = 2
COUNTS = [3, 2]

# reference criterion fabricates DN indices with hard .cuda() calls
# (criterion.py:393-399); make them no-ops on this CPU-only box.
torch.Tensor.cuda = lambda self, *a, **k: self


def _load_ref_train_modules():
    import ref_loader

    ref_loader.install_torchvision_stub()
    ref_loader.load_reference()  # installs the omegaconf stub + namespace pkgs
    _ns_pkg("refsrc", f"{REF}/src")
    _ns_pkg("refsrc.models", f"{REF}/src/models")
    _ns_pkg("refsrc.models.detrpose", f"{REF}/src/models/detrpose")
    _ns_pkg("refsrc.misc", f"{REF}/src/misc")
    _ns_pkg("refsrc.data", f"{REF}/src/data")
    import importlib

    crit = importlib.import_module("refsrc.models.detrpose.criterion")
    matcher = importlib.import_module("refsrc.models.detrpose.matcher")
    transformer = importlib.import_module("refsrc.models.detrpose.transformer")
    return crit, matcher, transformer


def _make_batch(rng):
    """One padded numpy batch + the reference's list-of-dicts layout."""
    G = max(COUNTS)
    t_np = {
        "labels": np.zeros((B, G), np.int32),
        "boxes": np.zeros((B, G, 4), np.float32),
        "keypoints": np.zeros((B, G, 3 * K), np.float32),
        "area": np.full((B, G), 1.0, np.float32),
        "valid": np.zeros((B, G), bool),
    }
    t_torch = []
    for b in range(B):
        n = COUNTS[b]
        kp = rng.uniform(0.15, 0.85, (n, 2 * K)).astype(np.float32)
        vis = (rng.uniform(size=(n, K)) > 0.2).astype(np.float32)
        area = rng.uniform(0.02, 0.2, (n,)).astype(np.float32)
        ctr = kp.reshape(n, K, 2).mean(1)
        boxes = np.concatenate(
            [ctr, np.full((n, 2), 0.25, np.float32)], -1)  # cxcywh normalized
        t_np["labels"][b, :n] = 0
        t_np["boxes"][b, :n] = boxes
        t_np["keypoints"][b, :n] = np.concatenate([kp, vis], -1)
        t_np["area"][b, :n] = area
        t_np["valid"][b, :n] = True
        t_torch.append({
            "labels": torch.zeros(n, dtype=torch.long),
            "boxes": torch.from_numpy(boxes),
            "keypoints": torch.from_numpy(np.concatenate([kp, vis], -1)),
            "area": torch.from_numpy(area),
        })
    images = rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)
    return images, t_np, t_torch


def _patch_layer_forward(ref_transformer_mod):
    """Out-of-place rewrite of the reference decoder layer forward.

    The shipped layer adds the pos embedding IN PLACE (`tensor[:,:,-np:] += pos`,
    transformer.py:359-370) on the tensor whose views the class/LQE heads of the
    PREVIOUS iteration saved for backward — torch's version counter then rejects
    loss.backward() outright. The rewrite computes the identical values (the
    pos-added tensor feeds the attention value, residual and gateway, exactly
    like the in-place aliasing did), so the gradients it yields are the
    gradients the reference math defines (in-place vs out-of-place cannot
    change them). Mirrors transformer.py:387-442, default flags.
    """

    def add_pos(t, pos):
        if pos is None:
            return t
        npn = pos.shape[2]
        return torch.cat([t[:, :, :-npn], t[:, :, -npn:] + pos], dim=2)

    def fwd(self, tgt_pose, tgt_pose_query_pos=None,
            tgt_pose_reference_points=None, attn_mask=None, memory=None,
            memory_spatial_shapes=None):
        assert not self.is_energy and not self.use_kan
        bs, nq, num_kpt, d = tgt_pose.shape
        x = add_pos(tgt_pose, tgt_pose_query_pos)  # persists into value+residual
        t2 = self.within_attn(
            x.flatten(0, 1), x.flatten(0, 1), x.flatten(0, 1)
        )[0].reshape(bs, nq, num_kpt, d)
        x = self.within_norm(x + self.within_dropout(t2))
        x = x.transpose(1, 2).flatten(0, 1)
        t2 = self.across_attn(x, x, x, attn_mask=attn_mask)[0]
        x = self.across_norm(x + self.across_dropout(t2))
        x = x.reshape(bs, num_kpt, nq, d).transpose(1, 2)
        x = add_pos(x, tgt_pose_query_pos)
        t2 = self.cross_attn(
            x.flatten(1, 2), tgt_pose_reference_points, memory,
            memory_spatial_shapes).reshape(bs, nq, num_kpt, d)
        x = self.gateway(x, self.dropout1(t2))
        return self.forward_FFN(x)

    ref_transformer_mod.DeformableTransformerDecoderLayer.forward = fwd


def _cdn_shim(dn_holder, num_queries):
    """Replay our build_cdn noise in the reference prepare_for_cdn layout.

    ``dn_holder``: either a dn dict or a mutable {"dn": ...} holder so
    multi-step tests can swap the noise per training step."""

    def shim(dn_args, training, num_queries, num_classes, num_keypoints,
             hidden_dim, label_enc, pose_enc, img_dim, device):
        dn = dn_holder["dn"] if isinstance(dn_holder, dict) and "dn" in dn_holder else dn_holder
        pad_cap = dn["labels"].shape[1]
        active = np.asarray(dn["dn_match"]["active_mask"])
        pad_size = int(active.sum())
        Bsz = dn["labels"].shape[0]
        labels = torch.from_numpy(dn["labels"][:, :pad_size].astype(np.int64))
        used = torch.from_numpy(
            dn["slot_used"][:, :pad_size].astype(np.float32))
        lab_emb = label_enc(labels)                       # (B, pad, hd)
        pose_emb = pose_enc.weight[None, None].expand(
            Bsz, pad_size, num_keypoints, hidden_dim)
        iql = torch.cat([lab_emb[:, :, None], pose_emb], dim=2)
        iql = iql * used[:, :, None, None]                # zero pad slots
        iqp = torch.from_numpy(dn["pose_logits"][:, :pad_size].copy())
        idx = np.r_[np.arange(pad_size), np.arange(pad_cap, pad_cap + num_queries)]
        am = torch.from_numpy(np.asarray(dn["attn_mask"])[np.ix_(idx, idx)])
        dn_meta = {"pad_size": pad_size,
                   "num_dn_group": int(dn["num_dn_group"])}
        return iql, iqp, am, dn_meta

    return shim


def _compare_grad_trees(grads_j, grads_t, prefix=""):
    """Per-leaf gradient agreement: rel-l2 <= 1e-3 (with a small absolute
    floor for true-zero gradients like attention k-biases) and cosine >=
    1 - 1e-5 for leaves of meaningful magnitude. Returns ([] if ok, else
    diagnostics) plus the concatenated vectors for the global check."""
    flat_j = jax.tree_util.tree_flatten_with_path(grads_j)[0]
    flat_t = jax.tree.leaves(grads_t)
    assert len(flat_j) == len(flat_t)
    all_j, all_t, bad = [], [], []
    for (path, gj), gt in zip(flat_j, flat_t):
        name = prefix + "/".join(getattr(p, "key", str(p)) for p in path)
        if name.startswith("backbone") and "/bn/" in name:
            # FrozenBatchNorm affine: a buffer in torch (no grad computed),
            # an optimizer-masked param here (train/optim.py set_to_zero) —
            # neither trainer updates it, so its gradient is out of scope.
            continue
        gj = np.asarray(gj, np.float64).ravel()
        gt = np.asarray(gt, np.float64).ravel()
        all_j.append(gj)
        all_t.append(gt)
        nt = np.linalg.norm(gt)
        nj = np.linalg.norm(gj)
        diff = np.linalg.norm(gj - gt)
        # size-aware absolute floor: mathematically-zero grads (softmax key
        # biases) and cancellation-dominated reductions (BN bias = sum of
        # near-canceling upstream grads) are pure f32 noise on both sides
        if diff <= 1e-3 * nt + 1e-5 * np.sqrt(gt.size):
            continue
        cos = float(gj @ gt / ((nj * nt) + 1e-30))
        bad.append((name, diff / (nt + 1e-12), cos, nt))
    return bad, all_j, all_t

@pytest.mark.slow
def test_training_gradients_match_reference():
    """Stage-wise jacobian parity over the FULL training backward.

    The chain images -> backbone -> encoder -> transformer -> criterion is
    verified stage by stage with SHARED inputs and SHARED cotangents, at
    WELL-CONDITIONED test points. A naive single-call end-to-end comparison is
    meaningless at random init (measured): the backbone collapses activations
    to ~1e-4 std, so (a) the encoder's first BatchNorms divide by
    rsqrt(var~1e-10 + eps) and the jacobian's condition number reaches ~1e5 —
    bit-level f32 noise explodes to O(0.5) relative gradient differences — and
    (b) the 60-of-80 anchor top-k and the Hungarian matching are degenerate
    ties, flipping even between torch-no_grad and torch-grad contexts of the
    SAME model (|g_ef0| 40.1 vs 49.1 measured). Stage-wise at sane scales,
    every gradient matches torch to ~1e-6.

    Covered: criterion backward on realistic outputs (detached-OKS VFL target,
    keypoint/OKS losses, union matching, DN branch incl. inert-slot masking);
    transformer jacobian (two-stage selection, CDN embedding paths, scan
    decoder with its inter-layer stop_gradients, FDR carries, MSDeformAttn);
    encoder jacobian (AIFI + FPN/PAN, train-mode BN); backbone jacobian
    (frozen-BN semantics, LAB affines).
    """
    crit_mod, matcher_mod, ref_transformer_mod = _load_ref_train_modules()

    torch.manual_seed(0)
    ref_model, cfg = build_reference_model("n", eval_hw=(HW, HW))
    sd = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
    # separate the two-stage selection scores so top-k order is well-defined
    sd["transformer.enc_out_class_embed.weight"] = (
        sd["transformer.enc_out_class_embed.weight"] * 50.0)
    # randomize the circle-pattern sampling-offset biases: the exact-binary
    # circle constants combined with saturated sigmoid refs (exact 0/1) put
    # sampling coordinates precisely ON bilinear kinks/borders, where the
    # subgradient choice is implementation-defined (measured: 20-30% grad
    # differences AT those measure-zero points, 5e-7 everywhere else)
    rng_b = np.random.default_rng(42)
    for k_ in list(sd):
        if "sampling_offsets.bias" in k_:
            sd[k_] = (0.3 * rng_b.standard_normal(sd[k_].shape)).astype(np.float32)
    ref_model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    ref_model.train()

    rng = np.random.default_rng(0)
    images, t_np, t_torch = _make_batch(rng)
    dn = build_cdn(t_np, cfg.num_queries, K, (HW, HW), rng)
    assert dn is not None
    pad_size = int(np.asarray(dn["dn_match"]["active_mask"]).sum())
    pad_cap = dn["labels"].shape[1]

    ref_transformer_mod.prepare_for_cdn = _cdn_shim(dn, cfg.num_queries)
    _patch_layer_forward(ref_transformer_mod)
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_keypoints=10.0, cost_oks=4.0, focal_alpha=0.25,
        num_body_points=K)
    ref_crit = crit_mod.Criterion(
        num_classes=C, matcher=matcher,
        weight_dict={"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0},
        losses=["vfl", "keypoints"], num_body_points=K)
    ref_crit.train()

    from detrpose_tpu.models import HGNetv2, HybridEncoder, Transformer

    model = build_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, HW, HW, 3)), train=True))
    variables = convert_state_dict(sd, dict(template))
    params = jax.tree.map(jnp.asarray, variables["params"])
    stats = jax.tree.map(jnp.asarray, variables["batch_stats"])

    dn_j = jax.tree.map(
        jnp.asarray, {k: v for k, v in dn.items()
                      if k not in ("pad_size", "num_dn_group")})
    targets_j = {k: jnp.asarray(v) for k, v in t_np.items()}
    targets_j["dn_match"] = dict(
        dn_j["dn_match"],
        active_mask=dn_j["dn_match"]["active_mask"][:pad_size])

    bad_all, vec_j, vec_t = [], [], []

    def accumulate(bad, aj, at):
        bad_all.extend(bad)
        vec_j.extend(aj)
        vec_t.extend(at)

    def to_converted(named_grads, subtree_template, prefix):
        """Torch named grads -> flax layout via the weight converter.

        The subtree is re-rooted under its top-level name so the converter's
        path rewrites (which match full model paths) apply.
        """
        root = prefix.rstrip(".")
        sd_g = {k: np.zeros(v.shape, np.float32)
                for k, v in ref_model.state_dict().items()
                if k.startswith(prefix) and not k.endswith(
                    ("running_mean", "running_var", "num_batches_tracked"))}
        sd_g.update(named_grads)
        return convert_state_dict(
            sd_g, {"params": {root: subtree_template}})["params"][root]

    nq = cfg.num_queries

    # ------------------------------------------------ stage 1: criterion
    # realistic-looking outputs: logits spread like a trained model, keypoints
    # in (0, 1) — identical inputs => identical costs => identical assignments
    def fab(shape_l, shape_k):
        return (rng.standard_normal(shape_l).astype(np.float32) * 2.0,
                rng.uniform(0.05, 0.95, shape_k).astype(np.float32))

    nL = cfg.num_decoder_layers
    fab_tree = {
        "fl": fab((B, nq, C), (B, nq, 2 * K)),
        "pl": fab((B, nq, C), (B, nq, 2 * K)),
        "il": fab((B, nq, C), (B, nq, 2 * K)),
        "al": [fab((B, nq, C), (B, nq, 2 * K)) for _ in range(nL - 1)],
        "dl": [fab((B, pad_size, C), (B, pad_size, 2 * K)) for _ in range(nL)],
        "dpl": fab((B, pad_size, C), (B, pad_size, 2 * K)),
    }

    def t_out(requires_grad=True):
        def tt(x):
            t = torch.from_numpy(x.copy())
            if requires_grad:
                t.requires_grad_(True)
            return t
        return {
            "pred_logits": tt(fab_tree["fl"][0]),
            "pred_keypoints": tt(fab_tree["fl"][1]),
            "up": torch.tensor([0.5]), "reg_scale": torch.tensor([4.0]),
            "reg_max": 32,
            "aux_outputs": [{"pred_logits": tt(l), "pred_keypoints": tt(k)}
                            for l, k in fab_tree["al"]],
            "aux_pre_outputs": {"pred_logits": tt(fab_tree["pl"][0]),
                                "pred_keypoints": tt(fab_tree["pl"][1])},
            "aux_interm_outputs": [{"pred_logits": tt(fab_tree["il"][0]),
                                    "pred_keypoints": tt(fab_tree["il"][1])}],
            "dn_aux_outputs": [{"pred_logits": tt(l), "pred_keypoints": tt(k)}
                               for l, k in fab_tree["dl"]],
            "dn_aux_pre_outputs": {"pred_logits": tt(fab_tree["dpl"][0]),
                                   "pred_keypoints": tt(fab_tree["dpl"][1])},
            "dn_meta": {"pad_size": pad_size,
                        "num_dn_group": int(dn["num_dn_group"])},
        }

    out_t = t_out()
    grad_leaves_t = [v for v in jax.tree.leaves(out_t)
                     if isinstance(v, torch.Tensor) and v.requires_grad]
    total_t = sum(ref_crit(out_t, t_torch).values())
    total_t.backward()

    def j_out():
        jj = jnp.asarray
        return {
            "pred_logits": jj(fab_tree["fl"][0]),
            "pred_keypoints": jj(fab_tree["fl"][1]),
            "aux_outputs": [{"pred_logits": jj(l), "pred_keypoints": jj(k)}
                            for l, k in fab_tree["al"]],
            "aux_pre_outputs": {"pred_logits": jj(fab_tree["pl"][0]),
                                "pred_keypoints": jj(fab_tree["pl"][1])},
            "aux_interm_outputs": [{"pred_logits": jj(fab_tree["il"][0]),
                                    "pred_keypoints": jj(fab_tree["il"][1])}],
            "dn_aux_outputs": [{"pred_logits": jj(l), "pred_keypoints": jj(k)}
                               for l, k in fab_tree["dl"]],
            "dn_aux_pre_outputs": {"pred_logits": jj(fab_tree["dpl"][0]),
                                   "pred_keypoints": jj(fab_tree["dpl"][1])},
        }

    def crit_loss(ov):
        losses = our_criterion(ov, targets_j, K, C, matcher_backend="scipy")
        total = jnp.asarray(0.0, jnp.float32)
        for v in losses.values():
            total = total + v.astype(jnp.float32)
        return total

    total_j, d_out_j = jax.jit(jax.value_and_grad(crit_loss))(j_out())
    assert float(total_t) == pytest.approx(float(total_j), rel=1e-4), (
        float(total_t), float(total_j))
    d_out_t = [(t.grad.detach().numpy() if t.grad is not None
                else np.zeros(t.shape, np.float32)) for t in grad_leaves_t]
    d_out_j_leaves = [np.asarray(x) for x in jax.tree.leaves(d_out_j)]
    assert len(d_out_t) == len(d_out_j_leaves)
    accumulate(*_compare_grad_trees(
        {"o": d_out_j_leaves}, {"o": d_out_t}, "criterion:d_out/"))

    # --------------------------------------------- stage 2: transformer
    # well-conditioned shared ef: unit-ish scale for stable top-k on both
    # sides, but scaled to 0.3 so the two-stage proposal sigmoids do NOT
    # saturate to exact 0/1 (saturated refs park sampling locations on
    # bilinear subgradient kinks, see the sd doctoring note above);
    # Gaussian cotangents on every branch output
    shapes = [(HW // s, HW // s) for s in cfg.feat_strides]
    ef_np = [(0.3 * rng.standard_normal((B, h, w, cfg.hidden_dim))
              ).astype(np.float32) for h, w in shapes]

    def branch_list_t(out):
        lst = [out["pred_logits"], out["pred_keypoints"],
               out["aux_pre_outputs"]["pred_logits"],
               out["aux_pre_outputs"]["pred_keypoints"],
               out["aux_interm_outputs"][0]["pred_logits"],
               out["aux_interm_outputs"][0]["pred_keypoints"],
               out["dn_aux_pre_outputs"]["pred_logits"],
               out["dn_aux_pre_outputs"]["pred_keypoints"]]
        for a in out["aux_outputs"]:
            lst += [a["pred_logits"], a["pred_keypoints"]]
        for a in out["dn_aux_outputs"]:
            lst += [a["pred_logits"], a["pred_keypoints"]]
        return lst

    x_t = torch.from_numpy(images.transpose(0, 3, 1, 2))
    ef_t = [torch.from_numpy(f.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
            for f in ef_np]
    out_tr_t = ref_model.transformer(ef_t, t_torch, x_t)
    bl_t = branch_list_t(out_tr_t)
    cts_np = [rng.standard_normal(tuple(t.shape)).astype(np.float32)
              for t in bl_t]
    tr_params_named = [(n, p) for n, p in
                       ref_model.transformer.named_parameters()
                       if p.requires_grad]
    g_all = torch.autograd.grad(
        bl_t, [p for _, p in tr_params_named] + ef_t,
        grad_outputs=[torch.from_numpy(c) for c in cts_np],
        allow_unused=True)
    g_tr_named = {f"transformer.{n}": (g.detach().numpy() if g is not None
                                       else np.zeros(p.shape, np.float32))
                  for (n, p), g in zip(tr_params_named, g_all)}
    g_ef_t = [g.detach().numpy().transpose(0, 2, 3, 1)
              for g in g_all[len(tr_params_named):]]

    tr = Transformer(
        hidden_dim=cfg.hidden_dim, num_queries=cfg.num_queries,
        num_decoder_layers=cfg.num_decoder_layers,
        dim_feedforward=cfg.dec_dim_feedforward,
        num_feature_levels=cfg.n_levels, dec_n_points=cfg.dec_n_points,
        num_classes=cfg.num_classes, num_body_points=cfg.num_body_points,
        reg_max=cfg.reg_max, reg_scale=cfg.reg_scale)

    def tr_branches(tv, ef):
        out = tr.apply({"params": tv}, ef, train=True, dn=dn_j)
        # slice our static-capacity dn block to the reference's pad_size so
        # the branch lists align (inert slots are dead in the losses)
        lst = [out["pred_logits"], out["pred_keypoints"],
               out["aux_pre_outputs"]["pred_logits"],
               out["aux_pre_outputs"]["pred_keypoints"],
               out["aux_interm_outputs"][0]["pred_logits"],
               out["aux_interm_outputs"][0]["pred_keypoints"],
               out["dn_aux_pre_outputs"]["pred_logits"][:, :pad_size],
               out["dn_aux_pre_outputs"]["pred_keypoints"][:, :pad_size]]
        for a in out["aux_outputs"]:
            lst += [a["pred_logits"], a["pred_keypoints"]]
        for a in out["dn_aux_outputs"]:
            lst += [a["pred_logits"][:, :pad_size],
                    a["pred_keypoints"][:, :pad_size]]
        return lst

    # forward parity of every branch at this shared point
    out_j_leaves = jax.jit(tr_branches)(params["transformer"],
                                        [jnp.asarray(f) for f in ef_np])
    for a, b in zip(out_j_leaves, bl_t):
        np.testing.assert_allclose(np.asarray(a), b.detach().numpy(),
                                   rtol=5e-3, atol=5e-4)

    _, tr_vjp = jax.vjp(tr_branches, params["transformer"],
                        [jnp.asarray(f) for f in ef_np])
    g_tr_j, g_ef_j = jax.jit(tr_vjp)([jnp.asarray(c) for c in cts_np])
    g_tr_torch = to_converted(g_tr_named, g_tr_j, "transformer.")
    accumulate(*_compare_grad_trees(g_tr_j, g_tr_torch, "transformer/"))
    accumulate(*_compare_grad_trees(
        {"ef": list(map(jnp.asarray, g_ef_j))}, {"ef": g_ef_t}, "g_ef:"))

    # ------------------------------------------------ stage 3: encoder
    fshapes = [(HW // s, HW // s, c)
               for s, c in zip(cfg.feat_strides, cfg.in_channels)]
    feats_np = [rng.standard_normal((B, h, w, c)).astype(np.float32)
                for h, w, c in fshapes]
    feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2).copy()
                                ).requires_grad_(True) for f in feats_np]
    ref_model.encoder.train()
    ef_out_t = ref_model.encoder(feats_t)
    ct_ef = [rng.standard_normal(tuple(f.shape)).astype(np.float32)
             for f in ef_out_t]
    enc_params_named = [(n, p) for n, p in
                        ref_model.encoder.named_parameters() if p.requires_grad]
    g_all = torch.autograd.grad(
        ef_out_t, [p for _, p in enc_params_named] + feats_t,
        grad_outputs=[torch.from_numpy(c) for c in ct_ef], allow_unused=True)
    g_enc_named = {f"encoder.{n}": (g.detach().numpy() if g is not None
                                    else np.zeros(p.shape, np.float32))
                   for (n, p), g in zip(enc_params_named, g_all)}
    g_feat_t = [g.detach().numpy().transpose(0, 2, 3, 1)
                for g in g_all[len(enc_params_named):]]

    enc = HybridEncoder(
        in_channels=tuple(cfg.in_channels),
        feat_strides=tuple(cfg.feat_strides),
        n_levels=cfg.n_levels, hidden_dim=cfg.hidden_dim,
        dim_feedforward=cfg.enc_dim_feedforward,
        use_encoder_idx=tuple(cfg.use_encoder_idx),
        expansion=cfg.expansion, depth_mult=cfg.depth_mult)

    def enc_fn(ev, feats):
        return enc.apply({"params": ev, "batch_stats": stats["encoder"]},
                         feats, train=True, mutable=["batch_stats"])[0]

    _, enc_vjp = jax.vjp(enc_fn, params["encoder"],
                         [jnp.asarray(f) for f in feats_np])
    g_enc_j, g_feats_j = jax.jit(enc_vjp)(
        [jnp.asarray(c.transpose(0, 2, 3, 1)) for c in ct_ef])
    g_enc_torch = to_converted(g_enc_named, g_enc_j, "encoder.")
    accumulate(*_compare_grad_trees(g_enc_j, g_enc_torch, "encoder/"))
    accumulate(*_compare_grad_trees(
        {"feats": list(map(jnp.asarray, g_feats_j))},
        {"feats": g_feat_t}, "g_feat:"))

    # ------------------------------------------------ stage 4: backbone
    bb_in_t = x_t.clone()
    bb_out_t = ref_model.backbone(bb_in_t)
    ct_bb = [rng.standard_normal(tuple(f.shape)).astype(np.float32)
             for f in bb_out_t]
    bb_params_named = [(n, p) for n, p in
                       ref_model.backbone.named_parameters() if p.requires_grad]
    g_all = torch.autograd.grad(
        bb_out_t, [p for _, p in bb_params_named],
        grad_outputs=[torch.from_numpy(c) for c in ct_bb], allow_unused=True)
    g_bb_named = {f"backbone.{n}": (g.detach().numpy() if g is not None
                                    else np.zeros(p.shape, np.float32))
                  for (n, p), g in zip(bb_params_named, g_all)}

    bb = HGNetv2(arch=cfg.backbone_name, use_lab=cfg.use_lab,
                 return_idx=tuple(cfg.return_idx))

    def bb_fn(bv):
        return bb.apply({"params": bv, "batch_stats": stats["backbone"]},
                        jnp.asarray(images), train=True,
                        mutable=["batch_stats"])[0]

    _, bb_vjp = jax.vjp(bb_fn, params["backbone"])
    (g_bb_j,) = jax.jit(bb_vjp)(
        [jnp.asarray(c.transpose(0, 2, 3, 1)) for c in ct_bb])
    g_bb_torch = to_converted(g_bb_named, g_bb_j, "backbone.")
    accumulate(*_compare_grad_trees(g_bb_j, g_bb_torch, "backbone/"))

    assert not bad_all, "\n".join(
        f"{n}: rel={r:.2e} cos={c:.8f} |ref|={s:.2e}"
        for n, r, c, s in bad_all[:20])

    # global agreement of the full stage-chained gradient vector
    gj = np.concatenate([v for v in vec_j])
    gt = np.concatenate([v for v in vec_t])
    rel = np.linalg.norm(gj - gt) / np.linalg.norm(gt)
    cos = gj @ gt / (np.linalg.norm(gj) * np.linalg.norm(gt))
    assert rel <= 1e-3, rel
    assert cos >= 1.0 - 1e-6, cos

@pytest.mark.slow
def test_20_step_loss_trajectory_matches_reference():
    """Train BOTH stacks for 20 steps on synced batches (same data, same CDN
    noise, scipy matching, single-group AdamW lr 1e-4 + clip 0.1) and compare
    the loss trajectories — the end-to-end check that gradients, clipping and
    the optimizer produce the same training dynamics (VERDICT r2 #1)."""
    import jax.numpy as jnp  # noqa: F811
    import optax

    from detrpose_tpu.parallel import init_train_state, make_train_step
    from detrpose_tpu.train.optim import make_optimizer

    crit_mod, matcher_mod, ref_transformer_mod = _load_ref_train_modules()

    torch.manual_seed(0)
    ref_model, cfg = build_reference_model("n", eval_hw=(HW, HW))
    sd = {k: v.detach().numpy().copy() for k, v in ref_model.state_dict().items()}
    sd["transformer.enc_out_class_embed.weight"] = (
        sd["transformer.enc_out_class_embed.weight"] * 50.0)
    ref_model.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    ref_model.train()

    n_steps = 20
    rng = np.random.default_rng(7)
    steps = []
    for _ in range(n_steps):
        images, t_np, t_torch = _make_batch(rng)
        dn = build_cdn(t_np, cfg.num_queries, K, (HW, HW), rng)
        steps.append((images, t_np, t_torch, dn))

    holder = {"dn": steps[0][3]}
    ref_transformer_mod.prepare_for_cdn = _cdn_shim(holder, cfg.num_queries)
    _patch_layer_forward(ref_transformer_mod)
    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_keypoints=10.0, cost_oks=4.0, focal_alpha=0.25,
        num_body_points=K)
    ref_crit = crit_mod.Criterion(
        num_classes=C, matcher=matcher,
        weight_dict={"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0},
        losses=["vfl", "keypoints"], num_body_points=K)
    ref_crit.train()

    # ---- torch: 20 steps, single-group AdamW (reference engine.py:62-95)
    torch_params = [p for p in ref_model.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(torch_params, lr=1e-4, betas=(0.9, 0.999),
                            weight_decay=1e-4)
    traj_t = []
    for images, t_np, t_torch, dn in steps:
        holder["dn"] = dn
        x_t = torch.from_numpy(images.transpose(0, 3, 1, 2))
        out_t = ref_model(x_t, t_torch)
        total = sum(ref_crit(out_t, t_torch).values())
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(torch_params, 0.1)
        opt.step()
        traj_t.append(float(total.detach()))

    # ---- jax: the production train step (same lr for backbone so the single
    # torch param group is mirrored; EMA off — it does not affect the loss)
    model = build_model(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, HW, HW, 3)), train=True))
    variables = convert_state_dict(sd, dict(template))
    tx = make_optimizer(template["params"], base_lr=1e-4, backbone_lr=1e-4,
                        clip_max_norm=0.1, milestones=(10 ** 6,))
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, HW, HW, 3)), use_ema=False)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        opt_state=tx.init(jax.tree.map(jnp.asarray, variables["params"])))
    step_fn = jax.jit(make_train_step(
        model, tx, num_body_points=K, num_classes=cfg.num_classes,
        matcher_backend="scipy", use_ema=False))

    traj_j = []
    for images, t_np, t_torch, dn in steps:
        dn_j = jax.tree.map(
            jnp.asarray, {k: v for k, v in dn.items()
                          if k not in ("pad_size", "num_dn_group")})
        batch = {"images": jnp.asarray(images),
                 "targets": {k: jnp.asarray(v) for k, v in t_np.items()},
                 "dn": dn_j}
        state, metrics = step_fn(state, batch)
        traj_j.append(float(metrics["loss_total"]))

    # Step 0 (identical weights + batch) must agree tightly. Later steps are
    # an ENVELOPE check only: at random init the matcher/top-k operate on
    # degenerate near-tied features, so the two frameworks' updates diverge in
    # tie-broken directions and the trajectories separate chaotically (this is
    # measured even torch-vs-torch across no_grad/grad contexts; see the
    # stage-wise test docstring). The envelope still catches gross dynamics
    # bugs: a mis-wired lr, missing clipping, or a wrong loss normalizer moves
    # the trajectory by multiples, not tens of percent.
    assert traj_j[0] == pytest.approx(traj_t[0], rel=2e-3)
    assert traj_j[1] == pytest.approx(traj_t[1], rel=5e-2)
    for i, (a, b) in enumerate(zip(traj_j, traj_t)):
        assert a == pytest.approx(b, rel=0.5), (i, a, b, traj_j, traj_t)
    assert np.mean(traj_j) == pytest.approx(np.mean(traj_t), rel=0.15), (
        traj_j, traj_t)

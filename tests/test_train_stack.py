"""Tests for matcher / criterion / CDN / train step."""
import importlib.util

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detrpose_tpu.train.matcher import match_cost, auction_assign, scipy_assign
from detrpose_tpu.train.cdn import build_cdn, CDNConfig
from detrpose_tpu.train.criterion import criterion


def _rand_targets(rng, B, G, K, n_valid=None):
    kxy = rng.uniform(0.1, 0.9, (B, G, K, 2)).astype(np.float32)
    t = {
        "labels": np.zeros((B, G), np.int32),
        "boxes": np.concatenate(
            [kxy.mean(2), np.full((B, G, 2), 0.3, np.float32)], -1),
        "keypoints": np.concatenate(
            [kxy.reshape(B, G, 2 * K),
             (rng.uniform(size=(B, G, K)) > 0.2).astype(np.float32)], -1),
        "area": rng.uniform(0.02, 0.2, (B, G)).astype(np.float32),
        "valid": np.ones((B, G), bool),
    }
    if n_valid is not None:
        for b in range(B):
            t["valid"][b, n_valid[b]:] = False
    return t


def test_match_cost_matches_reference_matcher():
    """Cost + assignment vs the reference HungarianMatcher on identical inputs."""
    import torch

    spec = importlib.util.spec_from_file_location(
        "ref_matcher", "/root/reference/src/models/detrpose/matcher.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(0)
    B, nq, G, K, C = 2, 12, 5, 17, 2
    logits = rng.standard_normal((B, nq, C)).astype(np.float32)
    kpts = rng.uniform(0, 1, (B, nq, 2 * K)).astype(np.float32)
    tgts = _rand_targets(rng, B, G, K)

    cost = np.asarray(match_cost(
        jnp.asarray(logits), jnp.asarray(kpts),
        {k: jnp.asarray(v) for k, v in tgts.items()}, K))

    m = ref.HungarianMatcher(cost_class=2.0, cost_keypoints=10.0, cost_oks=4.0,
                             focal_alpha=0.25, num_body_points=K)
    t_outputs = {
        "pred_logits": torch.from_numpy(logits),
        "pred_keypoints": torch.from_numpy(kpts),
    }
    t_targets = [
        {
            "labels": torch.from_numpy(tgts["labels"][b]),
            "keypoints": torch.from_numpy(tgts["keypoints"][b]),
            "area": torch.from_numpy(tgts["area"][b]),
            "boxes": torch.zeros(G, 4),
        }
        for b in range(B)
    ]
    ref_idx = m(t_outputs, t_targets)

    # Reference computes one flat (B*nq, sum G) matrix then splits; reconstruct
    # the per-image block to compare.
    # Instead compare through the assignment: same optimal matching.
    ours = np.asarray(scipy_assign(jnp.asarray(cost),
                                   jnp.asarray(tgts["valid"])))
    for b in range(B):
        r, c = ref_idx[b]
        ref_assign = np.zeros(G, np.int64)
        ref_assign[c.numpy()] = r.numpy()
        np.testing.assert_array_equal(ours[b], ref_assign)


def test_auction_close_to_optimal():
    rng = np.random.default_rng(1)
    B, nq, G = 4, 60, 8
    cost = rng.standard_normal((B, nq, G)).astype(np.float32) * 3
    valid = np.ones((B, G), bool)
    valid[2, 5:] = False

    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(valid)))
    s = np.asarray(scipy_assign(jnp.asarray(cost), jnp.asarray(valid)))
    for b in range(B):
        g = valid[b].sum()
        ca = cost[b, a[b, :g], np.arange(g)].sum()
        cs = cost[b, s[b, :g], np.arange(g)].sum()
        # auction must be near-optimal and produce distinct queries
        assert len(set(a[b, :g].tolist())) == g
        assert ca <= cs + 0.05 * abs(cs) + 0.1


def test_cdn_builder_structure():
    rng = np.random.default_rng(2)
    B, G, K, nq = 2, 6, 17, 60
    tgts = _rand_targets(rng, B, G, K, n_valid=[6, 3])
    dn = build_cdn(tgts, nq, K, (640, 640), rng)
    assert dn is not None
    cap = dn["pad_size"]
    assert dn["labels"].shape == (B, cap)
    assert dn["pose_logits"].shape == (B, cap, 1 + K, 2)
    assert dn["attn_mask"].shape == (cap + nq, cap + nq)
    # real queries must not see any DN slot
    assert dn["attn_mask"][cap:, :cap].all()
    # real queries see each other
    assert not dn["attn_mask"][cap:, cap:].any()
    # group 0 positives see their own group
    sp = 6  # single_pad = max_known
    assert not dn["attn_mask"][:2 * sp, :2 * sp].any()
    # ... but not group 1
    g = dn["num_dn_group"]
    if g > 1:
        assert dn["attn_mask"][:2 * sp, 2 * sp:4 * sp].all()
    # matches are valid queries within pad
    mv = dn["dn_match"]["valid"]
    assert (dn["dn_match"]["query_idx"][mv] < cap).all()


def test_cdn_direction_normalization_matches_torch():
    """The DN 'direction' reproduces torch F.normalize(v, -1) bug-for-bug.

    The reference (dn_component.py:121-122) comments "||rand_vector|| = 1" but
    F.normalize(rand_vector, -1) binds -1 to p (dim defaults to 1), so the
    vectors are p=-1-normalized over the 1+K axis and have heavy-tailed L2
    norms — the noise scale the zoo checkpoints were actually trained with.
    """
    import torch
    import torch.nn.functional as F

    from detrpose_tpu.train.cdn import _ref_normalize_pm1

    rng = np.random.default_rng(7)
    v = rng.random((12, 18, 2)).astype(np.float32)
    ours = _ref_normalize_pm1(v.astype(np.float64)).astype(np.float32)
    theirs = F.normalize(torch.from_numpy(v).double(), -1).float().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    # sanity: these are NOT unit vectors (mean L2 ~ 64 for 18 slots)
    norms = np.linalg.norm(ours, axis=-1)
    assert norms.mean() > 10.0


def test_cdn_label_flip_range_is_reference_80():
    """Label-noise flips draw from [0, 80) — the reference hard-codes
    num_classes=80 into prepare_for_cdn (transformer.py:1271) and indexes an
    81-row label_enc (transformer.py:1057), regardless of the 2-class head.
    Most flipped DN queries therefore hit otherwise-untrained embedding rows;
    the zoo checkpoints were trained with that distribution."""
    rng = np.random.default_rng(11)
    B, G, K, nq = 4, 8, 17, 60
    flipped = []
    for seed in range(8):
        tgts = _rand_targets(np.random.default_rng(seed), B, G, K)
        dn = build_cdn(tgts, nq, K, (640, 640), rng, CDNConfig())
        assert dn is not None
        lab = dn["labels"][dn["slot_used"]]
        assert lab.min() >= 0 and lab.max() < 80
        flipped.extend(lab[lab != 0].tolist())  # GT labels are all 0
    flipped = np.asarray(flipped)
    # uniform draws over [0,80) must cover the range broadly
    assert flipped.max() >= 60
    assert len(np.unique(flipped)) >= 30
    assert dn["labels"].shape[1] == CDNConfig().pad_cap


@pytest.mark.slow
def test_cdn_label_flip_golden_vs_live_reference(monkeypatch):
    """Drive the LIVE reference prepare_for_cdn (dn_component.py:39-183) and
    assert the flipped-label distribution matches ours.

    label_enc is set to the 81×81 identity so the noised class ids can be
    read back from the embedded DN queries by argmax; pose_enc is zeroed so
    only the instance slot carries the one-hot. GT labels are all 0 (the
    dataset's only class), so any nonzero recovered id is a label-noise flip.
    """
    import torch

    from tests.ref_loader import load_reference

    load_reference()  # installs the refsrc namespace packages
    import importlib as _il
    ref = _il.import_module("refsrc.models.detrpose.dn_component")

    # the reference hard-codes .cuda() on helper tensors; keep them on CPU
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    B, G, K, nq = 4, 8, 17, 60
    hd = 81
    label_enc = torch.nn.Embedding(81, hd)
    with torch.no_grad():
        label_enc.weight.copy_(torch.eye(81))
    pose_enc = torch.nn.Embedding(K, hd)
    with torch.no_grad():
        pose_enc.weight.zero_()

    def ref_flips(seed):
        torch.manual_seed(seed)
        tg = _rand_targets(np.random.default_rng(seed), B, G, K)
        targets = [
            {"labels": torch.from_numpy(tg["labels"][b]).long(),
             "boxes": torch.from_numpy(tg["boxes"][b]),
             "keypoints": torch.from_numpy(tg["keypoints"][b]),
             "area": torch.from_numpy(tg["area"][b])}
            for b in range(B)
        ]
        iql, _, _, _ = ref.prepare_for_cdn(
            dn_args=(targets, 20, 0.5), training=True, num_queries=nq,
            num_classes=80, num_keypoints=K, hidden_dim=hd,
            label_enc=label_enc, pose_enc=pose_enc, img_dim=(640, 640),
            device="cpu")
        inst = iql[:, :, 0, :]                        # (B, pad, 81) one-hots
        used = inst.abs().sum(-1) > 0.5
        labels = inst.argmax(-1)[used].numpy()
        assert labels.max() < 80                       # never row 80
        return labels[labels != 0]

    def our_flips(seed):
        rng = np.random.default_rng(1000 + seed)
        tg = _rand_targets(np.random.default_rng(seed), B, G, K)
        dn = build_cdn(tg, nq, K, (640, 640), rng, CDNConfig())
        lab = dn["labels"][dn["slot_used"]]
        return lab[lab != 0]

    nseeds = 30
    rflips = np.concatenate([ref_flips(s) for s in range(nseeds)])
    oflips = np.concatenate([our_flips(s) for s in range(nseeds)])

    # Both draw ~25% flips uniform over [0,80); a flip landing on the true
    # label 0 is invisible, so expected visible rate = 0.25 * 79/80.
    total = nseeds * B * G * 4  # 2 groups × (pos+neg) per GT per call
    exp = 0.25 * 79 / 80
    for flips in (rflips, oflips):
        rate = len(flips) / total
        assert abs(rate - exp) < 0.05, rate
        assert flips.min() >= 1 and flips.max() < 80
        assert len(np.unique(flips)) >= 80 * 0.7
    # coarse uniformity: each of 8 bins of [0,80) within 3.5σ of expectation
    # on both sides (binomial σ with p=1/8 per visible flip)
    for flips in (rflips, oflips):
        hist = np.histogram(flips, bins=8, range=(0, 80))[0]
        n = len(flips)
        sigma = np.sqrt(n * (1 / 8) * (7 / 8))
        assert (np.abs(hist - n / 8) < 3.5 * sigma + 3).all(), hist


def test_criterion_smoke_finite():
    rng = np.random.default_rng(3)
    B, nq, G, K, C, L = 2, 10, 4, 17, 2, 3
    tgts = {k: jnp.asarray(v) for k, v in _rand_targets(rng, B, G, K).items()}

    def fake_level():
        return {
            "pred_logits": jnp.asarray(rng.standard_normal((B, nq, C)).astype(np.float32)),
            "pred_keypoints": jnp.asarray(rng.uniform(0, 1, (B, nq, 2 * K)).astype(np.float32)),
        }

    outputs = fake_level()
    outputs["aux_outputs"] = [fake_level() for _ in range(L - 1)]
    outputs["aux_pre_outputs"] = fake_level()
    outputs["aux_interm_outputs"] = [fake_level()]

    losses = jax.jit(
        lambda o, t: criterion(o, t, K, C)
    )(outputs, tgts)
    assert len(losses) >= 3 * (L + 2)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow  # full-model compile
def test_criterion_grads_flow():
    rng = np.random.default_rng(4)
    B, nq, G, K, C = 2, 8, 3, 17, 2
    tgts = {k: jnp.asarray(v) for k, v in _rand_targets(rng, B, G, K).items()}
    logits = jnp.asarray(rng.standard_normal((B, nq, C)).astype(np.float32))
    kpts = jnp.asarray(rng.uniform(0, 1, (B, nq, 2 * K)).astype(np.float32))

    def loss(lg, kp):
        o = {"pred_logits": lg, "pred_keypoints": kp,
             "aux_outputs": [], "aux_pre_outputs": {"pred_logits": lg, "pred_keypoints": kp},
             "aux_interm_outputs": []}
        ls = criterion(o, tgts, K, C)
        return sum(ls.values())

    g1, g2 = jax.grad(loss, argnums=(0, 1))(logits, kpts)
    assert float(jnp.abs(g1).sum()) > 0
    assert float(jnp.abs(g2).sum()) > 0
    assert np.isfinite(np.asarray(g1)).all() and np.isfinite(np.asarray(g2)).all()


@pytest.mark.slow
def test_crowdpose_14kpt_train_step():
    """One full train step with num_body_points=14 (CrowdPose head): CDN,
    matcher, criterion, and FDR all parameterize on K (reference swaps
    num_body_points on transformer/criterion/matcher/postprocessor,
    detrpose_hgnetv2_l_crowdpose.py:41-44)."""
    import jax.numpy as jnp

    from detrpose_tpu.configs import build_model, model_config
    from detrpose_tpu.parallel import init_train_state, make_train_step
    from detrpose_tpu.train.cdn import build_cdn
    from detrpose_tpu.train.optim import make_optimizer

    K, HW, B, G = 14, 128, 2, 3
    cfg = model_config("n", num_body_points=K)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    kxy = rng.uniform(0.2, 0.8, (B, G, K, 2)).astype(np.float32)
    targets = {
        "labels": np.zeros((B, G), np.int32),
        "boxes": np.concatenate(
            [kxy.mean(2), np.full((B, G, 2), 0.25, np.float32)], -1),
        "keypoints": np.concatenate(
            [kxy.reshape(B, G, 2 * K), np.ones((B, G, K), np.float32)], -1),
        "area": np.full((B, G), 0.05, np.float32),
        "valid": np.ones((B, G), bool),
    }
    dn = build_cdn(targets, cfg.num_queries, K, (HW, HW), rng)
    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))["params"]
    tx = make_optimizer(params_shape, milestones=(1000,))
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, HW, HW, 3)))
    step = jax.jit(make_train_step(model, tx, num_body_points=K,
                                   num_classes=cfg.num_classes))
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (B, HW, HW, 3)).astype(np.float32)),
        "targets": jax.tree.map(jnp.asarray, targets),
        "dn": {k: (jax.tree.map(jnp.asarray, v)
                   if k not in ("pad_size", "num_dn_group") else v)
               for k, v in dn.items()},
    }
    new_state, metrics = step(state, batch)
    assert bool(metrics["finite"])
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_train_step_with_all_losses_enabled():
    """The losses list is config-addressable end to end: a train step built
    with losses=('vfl','labels','mal','keypoints','local') emits loss_ce /
    loss_mal / loss_dfl terms (wired train.py -> Trainer -> make_train_step ->
    criterion; reference instantiates Criterion(losses=...) from config)."""
    from detrpose_tpu.configs import build_model, model_config
    from detrpose_tpu.parallel import init_train_state, make_train_step
    from detrpose_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(5)
    HW = 64
    cfg = model_config("n", num_decoder_layers=2, hidden_dim=64,
                       enc_dim_feedforward=128, dec_dim_feedforward=128,
                       num_queries=12, dec_n_points=2)
    model = build_model(cfg)
    K = cfg.num_body_points

    t = _rand_targets(rng, 2, 3, K)
    dn = build_cdn(t, cfg.num_queries, K, (HW, HW), rng)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (2, HW, HW, 3)), jnp.float32),
        "targets": {k: jnp.asarray(v) for k, v in t.items()},
        "dn": jax.tree.map(
            jnp.asarray, {k: v for k, v in dn.items()
                          if k not in ("pad_size", "num_dn_group")}),
    }
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=True))
    tx = make_optimizer(template["params"], milestones=(10**6,))
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, HW, HW, 3)), use_ema=False)
    wd = {"loss_vfl": 2.0, "loss_keypoints": 10.0, "loss_oks": 4.0,
          "loss_ce": 1.0, "loss_mal": 1.0, "loss_dfl": 0.5}
    step = jax.jit(make_train_step(
        model, tx, num_body_points=K, num_classes=cfg.num_classes,
        weight_dict=wd, use_ema=False,
        losses=("vfl", "labels", "mal", "keypoints", "local")))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_total"]))
    for fam in ["loss_ce", "loss_mal", "loss_vfl", "loss_keypoints"]:
        assert fam in metrics, sorted(metrics)
        assert fam + "_dn_0" in metrics, sorted(metrics)
    # local distillation: aux layer 0 against the final-layer teacher, plus
    # the DN branches (final DN branch distills against itself -> exactly 0)
    assert "loss_dfl_0" in metrics and np.isfinite(float(metrics["loss_dfl_0"]))
    assert "loss_dfl_dn_0" in metrics
    nL = cfg.num_decoder_layers
    assert float(metrics[f"loss_dfl_dn_{nL - 1}"]) == 0.0


@pytest.mark.parametrize("method", ["sequential", "broadcast_all"])
def test_scipy_assign_vmap_methods_equivalent(method, monkeypatch):
    """Both callback batching modes produce identical assignments (the suite
    pins sequential via conftest because broadcast_all can wedge the XLA CPU
    executor when a torch training loop shares the process)."""
    monkeypatch.setenv("DETRPOSE_SCIPY_VMAP", method)
    from detrpose_tpu.train.matcher import scipy_assign

    rng = np.random.default_rng(0)
    M, B, nq, G = 5, 2, 12, 4
    cost = jnp.asarray(rng.standard_normal((M, B, nq, G)).astype(np.float32))
    valid = jnp.asarray(np.ones((B, G), bool))
    out_v = jax.jit(jax.vmap(lambda c: scipy_assign(c, valid)))(cost)
    out_ref = np.stack([np.asarray(scipy_assign(cost[m], valid))
                        for m in range(M)])
    np.testing.assert_array_equal(np.asarray(out_v), out_ref)

"""Backbone freeze knobs as optimizer masks.

Reference semantics (src/nn/backbone/hgnetv2.py:526-533, 566-569):
``freeze_at >= 0`` freezes the stem and, unless ``freeze_stem_only``, stages
0..freeze_at; ``freeze_network`` freezes the whole backbone. All are no-ops in
the shipped configs (include/detrpose_hgnetv2.py:34-35) — here they are
``set_to_zero`` optimizer groups (train/optim.py) instead of requires_grad
surgery.
"""
import jax
import jax.numpy as jnp
import numpy as np

from detrpose_tpu.train.optim import make_optimizer


def _params():
    leaf = lambda: jnp.ones((3,))
    return {
        "backbone": {
            "stem": {"stem1": {"conv": {"kernel": leaf()},
                               "bn": {"scale": leaf()}}},
            "stages_0": {"blocks_0": {"conv": {"kernel": leaf()}}},
            "stages_1": {"blocks_0": {"conv": {"kernel": leaf()}}},
        },
        "encoder": {"proj": {"kernel": leaf()}},
    }


def _moved(params, **kw):
    tx = make_optimizer(params, milestones=(100,), **kw)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, tx.init(params), params)
    flat = {"/".join(str(getattr(p, "key", p)) for p in path): bool(
        np.abs(np.asarray(leafv)).max() > 0)
        for path, leafv in jax.tree_util.tree_flatten_with_path(u)[0]}
    return flat


def test_default_only_backbone_bn_frozen():
    m = _moved(_params())
    assert not m["backbone/stem/stem1/bn/scale"]  # FrozenBatchNorm
    assert m["backbone/stem/stem1/conv/kernel"]
    assert m["backbone/stages_0/blocks_0/conv/kernel"]
    assert m["encoder/proj/kernel"]


def test_freeze_at_stem_only():
    m = _moved(_params(), freeze_at=0)
    assert not m["backbone/stem/stem1/conv/kernel"]
    assert m["backbone/stages_0/blocks_0/conv/kernel"]
    assert m["backbone/stages_1/blocks_0/conv/kernel"]
    assert m["encoder/proj/kernel"]


def test_freeze_at_with_stages():
    m = _moved(_params(), freeze_at=0, freeze_stem_only=False)
    assert not m["backbone/stem/stem1/conv/kernel"]
    assert not m["backbone/stages_0/blocks_0/conv/kernel"]
    assert m["backbone/stages_1/blocks_0/conv/kernel"]
    assert m["encoder/proj/kernel"]


def test_freeze_whole_backbone():
    m = _moved(_params(), freeze_backbone=True)
    assert not any(v for k, v in m.items() if k.startswith("backbone/"))
    assert m["encoder/proj/kernel"]


def _resnet_params():
    """ResNet naming exactly as models/resnet.py produces it: conv1/bn1 stem,
    layer{i+1}_{b} stages with inner conv1/bn1..bn3/downsample_bn — each BN is
    the layers.py BatchNorm wrapper, which nests an inner module named 'bn'
    (real param path: backbone/bn1/bn/scale)."""
    leaf = lambda: jnp.ones((3,))
    bn = lambda: {"bn": {"scale": leaf(), "bias": leaf()}}
    return {
        "backbone": {
            "conv1": {"kernel": leaf()},
            "bn1": bn(),
            "layer1_0": {"conv1": {"kernel": leaf()},
                         "bn1": bn(),
                         "downsample_bn": bn()},
            "layer2_0": {"conv1": {"kernel": leaf()}},
        },
        "encoder": {"proj": {"kernel": leaf()}},
    }


def test_resnet_fixture_matches_real_param_tree():
    """The fixture above must stay shaped like the real model's tree — the
    freeze logic pattern-matches path keys, so a divergent fixture would test
    shapes the model never produces (round-3 advice finding)."""
    from detrpose_tpu.models.resnet import ResNet

    model = ResNet(depth=50, return_idx=(1, 2, 3))
    real = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=True))["params"]
    fx = _resnet_params()["backbone"]
    assert set(fx["bn1"]) == {"bn"}
    assert set(fx["bn1"]["bn"]) <= set(real["bn1"]["bn"])
    assert set(fx["layer1_0"]["downsample_bn"]) == {"bn"}
    assert "conv1" in real and "layer1_0" in real and "layer2_0" in real


def test_resnet_default_bn_frozen():
    # FrozenBatchNorm2d semantics apply to the ResNet backbone too
    # (reference resnet.py:79 builds with FrozenBatchNorm2d throughout)
    m = _moved(_resnet_params())
    assert not m["backbone/bn1/bn/scale"]
    assert not m["backbone/layer1_0/bn1/bn/scale"]
    assert not m["backbone/layer1_0/downsample_bn/bn/scale"]
    assert m["backbone/conv1/kernel"]
    assert m["backbone/layer1_0/conv1/kernel"]
    assert m["encoder/proj/kernel"]


def test_resnet_freeze_at_maps_layers():
    m = _moved(_resnet_params(), freeze_at=0, freeze_stem_only=False)
    assert not m["backbone/conv1/kernel"]          # stem
    assert not m["backbone/layer1_0/conv1/kernel"]  # stage 0 (layer1)
    assert m["backbone/layer2_0/conv1/kernel"]      # stage 1 stays live


def test_resnet_trainer_default_freezes_layer1():
    """The Trainer's freeze defaults map the reference's unconditional
    conv1/bn1/layer1 freeze (resnet.py:64-66) onto
    freeze_at=0/freeze_stem_only=False when the backbone is a ResNet
    (round-3 advice finding: no preset wired this)."""
    from detrpose_tpu.train.optim import resolve_backbone_freeze

    assert resolve_backbone_freeze("resnet50") == (0, False)
    assert resolve_backbone_freeze("resnet101") == (0, False)
    # explicit settings win
    assert resolve_backbone_freeze("resnet50", freeze_at=1) == (1, True)
    # freeze_backbone supersedes (whole backbone is frozen anyway)
    assert resolve_backbone_freeze("resnet50", freeze_backbone=True) == (-1, True)
    # HGNetv2 untouched
    assert resolve_backbone_freeze("B4") == (-1, True)
    fa, fso = resolve_backbone_freeze("resnet50")
    m = _moved(_resnet_params(), freeze_at=fa, freeze_stem_only=fso)
    assert not m["backbone/conv1/kernel"]
    assert not m["backbone/layer1_0/conv1/kernel"]
    assert m["backbone/layer2_0/conv1/kernel"]

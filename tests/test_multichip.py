"""Sharded training step over the 8-virtual-device CPU mesh (DETRPose-N for
compile speed; the driver's __graft_entry__.dryrun_multichip covers L)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from detrpose_tpu.configs import model_config, build_model
from detrpose_tpu.parallel import make_mesh, make_train_step, init_train_state
from detrpose_tpu.train.optim import make_optimizer
from detrpose_tpu.train.cdn import build_cdn


@pytest.mark.slow
def test_sharded_train_step_n():
    K, G, H, W = 17, 3, 128, 128
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 cpu devices, got {n_dev}"
    B = n_dev

    cfg = model_config("n")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    kxy = rng.uniform(0.2, 0.8, (B, G, K, 2)).astype(np.float32)
    targets = {
        "labels": np.zeros((B, G), np.int32),
        "boxes": np.concatenate(
            [kxy.mean(2), np.full((B, G, 2), 0.2, np.float32)], -1),
        "keypoints": np.concatenate(
            [kxy.reshape(B, G, 2 * K), np.ones((B, G, K), np.float32)], -1),
        "area": np.full((B, G), 0.04, np.float32),
        "valid": np.ones((B, G), bool),
    }
    dn = build_cdn(targets, cfg.num_queries, K, (H, W), rng)

    mesh = make_mesh()
    shard_b = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    tx = make_optimizer(
        jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=True))["params"])
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             jnp.zeros((1, H, W, 3)))
    state = jax.device_put(state, repl)

    def put(tree, sh):
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)

    batch = {
        "images": put(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32), shard_b),
        "targets": put(targets, shard_b),
        "dn": {
            "labels": put(dn["labels"], shard_b),
            "slot_used": put(dn["slot_used"], shard_b),
            "pose_logits": put(dn["pose_logits"], shard_b),
            "attn_mask": put(dn["attn_mask"], repl),
            "dn_match": {
                "query_idx": put(dn["dn_match"]["query_idx"], shard_b),
                "gt_idx": put(dn["dn_match"]["gt_idx"], shard_b),
                "valid": put(dn["dn_match"]["valid"], shard_b),
                "num_group": put(dn["dn_match"]["num_group"], repl),
                "active_mask": put(dn["dn_match"]["active_mask"], repl),
            },
        },
    }
    step = make_train_step(model, tx, num_body_points=K, num_classes=cfg.num_classes)
    with mesh:
        jit_step = jax.jit(step)  # donation disabled: see memory/axon-sandbox-quirks
        state2, metrics = jit_step(state, batch)
        state3, metrics2 = jit_step(state2, batch)  # second step (donation path)
        jax.block_until_ready(metrics2)
    assert np.isfinite(float(metrics["loss_total"]))
    assert np.isfinite(float(metrics2["loss_total"]))
    # params actually moved
    assert int(state3.step) == 2
    # losses include dn terms
    assert any(k.endswith("_dn_0") for k in metrics)


@pytest.mark.slow
def test_sharded_batched_inference_matches_single_device():
    """Multi-chip batched serving (BASELINE config #5): the eval program
    batch-sharded over the 8-device mesh must produce the same detections as
    a single-device run — pjit replaces the reference's per-GPU TRT engines
    with one sharded XLA program."""
    from detrpose_tpu.models import postprocess

    K, H, W = 17, 128, 128
    n_dev = len(jax.devices())
    B = n_dev * 2  # 2 images per device

    cfg = model_config("n")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    ts = np.full((B, 2), 640.0, np.float32)

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False))()

    def fwd(v, img, sizes):
        return postprocess(model.apply(v, img, train=False), sizes,
                           num_body_points=K)

    # single device
    s1, l1, k1 = jax.jit(fwd)(variables, jnp.asarray(x), jnp.asarray(ts))

    # batch sharded over the mesh, params replicated
    mesh = make_mesh()
    shard_b = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    with mesh:
        sharded = jax.jit(fwd, in_shardings=(repl, shard_b, shard_b))
        s8, l8, k8 = sharded(jax.device_put(variables, repl),
                             jax.device_put(jnp.asarray(x), shard_b),
                             jax.device_put(jnp.asarray(ts), shard_b))

    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(l8), np.asarray(l1))

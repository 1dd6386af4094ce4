"""SPMD data-parallel tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.parallel import (
    make_mesh, make_parallel_train_step, replicate, shard_batch)
from feature_intertwiner_tpu.train.step import create_train_state
from test_model_forward import _synthetic_batch, tiny_model
from test_train_step import _cfg


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_parallel_train_step_runs_and_stays_replicated():
    n = 4
    mesh = make_mesh(n)
    model = tiny_model()
    rng = np.random.RandomState(0)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng, b=n)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images[:1], mode="train", gt_class_ids=gt_cls[:1],
        gt_boxes=gt_boxes[:1], gt_masks=gt_masks[:1])
    cfg = _cfg()
    cfg.TRAIN.BATCH_SIZE = n
    state = create_train_state(cfg, variables)
    state = replicate(state, mesh)
    batch = shard_batch(
        dict(images=images, gt_class_ids=gt_cls, gt_boxes=gt_boxes,
             gt_masks=gt_masks), mesh)
    step = make_parallel_train_step(model, cfg, "all", mesh)
    s1, metrics = step(state, batch, jnp.float32(1e-3), jnp.float32(1.0),
                       jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(s1.step) == 1
    # one more step from the updated state
    s2, m2 = step(s1, batch, jnp.float32(1e-3), jnp.float32(1.0),
                  jax.random.PRNGKey(3))
    assert np.isfinite(float(m2["total_loss"]))


@pytest.mark.slow
def test_bn_learn_batch_stats_replicated_under_mesh():
    """TRAIN.BN_LEARN under SPMD: per-device BN statistics must be pmean'd —
    the mesh result equals the average of per-shard single-device updates."""
    n = 2
    mesh = make_mesh(n)
    model = tiny_model()
    rng = np.random.RandomState(0)
    images, gt_cls, gt_boxes, gt_masks, _ = _synthetic_batch(rng, b=n)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        images[:1], mode="train", gt_class_ids=gt_cls[:1],
        gt_boxes=gt_boxes[:1], gt_masks=gt_masks[:1])
    cfg = _cfg()
    cfg.TRAIN.BATCH_SIZE = n
    cfg.TRAIN.BN_LEARN = True
    state = create_train_state(cfg, variables)

    # oracle: single-device steps on each shard with the per-device rng fold
    from feature_intertwiner_tpu.train.step import make_train_step
    single = jax.jit(make_train_step(model, cfg, "all"))
    rng0 = jax.random.PRNGKey(2)
    per_dev_stats = []
    for d in range(n):
        shard = dict(images=images[d:d + 1], gt_class_ids=gt_cls[d:d + 1],
                     gt_boxes=gt_boxes[d:d + 1], gt_masks=gt_masks[d:d + 1])
        sd, _ = single(state, shard, jnp.float32(1e-3), jnp.float32(1.0),
                       jax.random.fold_in(rng0, d))
        per_dev_stats.append(sd.batch_stats)
    expected = jax.tree_util.tree_map(
        lambda *xs: sum(xs) / len(xs), *per_dev_stats)

    pstate = replicate(state, mesh)
    batch = shard_batch(
        dict(images=images, gt_class_ids=gt_cls, gt_boxes=gt_boxes,
             gt_masks=gt_masks), mesh)
    pstep = make_parallel_train_step(model, cfg, "all", mesh)
    s1, _ = pstep(pstate, batch, jnp.float32(1e-3), jnp.float32(1.0), rng0)

    flat_e = jax.tree_util.tree_leaves(expected)
    flat_g = jax.tree_util.tree_leaves(s1.batch_stats)
    assert flat_e and len(flat_e) == len(flat_g)
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=2e-5, atol=2e-6)

"""SPMD invariants: replicated state stays bitwise-replicated across the
mesh, and the parallel step is deterministic for a fixed key."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.parallel import (
    make_mesh, make_parallel_train_step, replicate, shard_batch)
from feature_intertwiner_tpu.train.step import create_train_state
from test_model_forward import _synthetic_batch, tiny_model
from test_train_step import _cfg


@pytest.mark.slow
def test_state_stays_replicated_and_deterministic():
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
    batch = dict(images=images, gt_class_ids=gt_cls, gt_boxes=gt_boxes,
                 gt_masks=gt_masks)
    step = make_parallel_train_step(model, cfg, "all", mesh)

    # the parallel step donates its input state; rebuild from host copies so
    # each run gets fresh device buffers
    host_vars = jax.tree_util.tree_map(np.asarray, variables)

    def run():
        fresh = jax.tree_util.tree_map(jnp.asarray, host_vars)
        state = replicate(create_train_state(cfg, fresh), mesh)
        b = shard_batch(dict(batch), mesh)
        state, metrics = step(state, b, jnp.float32(1e-3), jnp.float32(1.0),
                              jax.random.PRNGKey(5))
        return state, float(metrics["total_loss"])

    s1, loss1 = run()
    s2, loss2 = run()
    # determinism across identical runs
    assert loss1 == loss2
    leaf1 = jax.tree_util.tree_leaves(s1.params)[3]
    leaf2 = jax.tree_util.tree_leaves(s2.params)[3]
    np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))

    # every device holds an identical copy of the replicated state
    shards = leaf1.addressable_shards
    assert len(shards) == n
    base = np.asarray(shards[0].data)
    for sh in shards[1:]:
        np.testing.assert_array_equal(np.asarray(sh.data), base)

    # buffer replicated too
    buf_shards = s1.buffer.addressable_shards
    base = np.asarray(buf_shards[0].data)
    for sh in buf_shards[1:]:
        np.testing.assert_array_equal(np.asarray(sh.data), base)

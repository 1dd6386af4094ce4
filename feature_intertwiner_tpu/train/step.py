"""The functional training step: forward, meta-loss + class buffer, update.

Replaces the reference's ``train_epoch`` inner loop
(``/root/reference/lib/workflow.py:105-270``) and ``MaskRCNN.meta_loss``
(``lib/model.py:143-224``) with one jitted function. The historic class
buffer — module state + in-place tensor shifts in the reference
(``initialize_buffer`` model.py:106-115, FIFO/running-mean update
:153-166) — is explicit functional state in :class:`TrainState`, checkpointed
with the params.

SPMD: under ``shard_map`` (parallel/data_parallel.py) the per-device
intertwiner statistics are merged with ``psum`` over the ``data`` axis —
the in-graph equivalent of the reference's cross-GPU ``[gpu, scale, 1024,
81]`` stat gathering (model.py:217-224, SURVEY.md §5) — and gradients are
``pmean``'d.

Loss assembly parity (workflow.py:183-221):
``Σ detailed + LOSS_FAC·meta + BIG_LOSS_FAC·mean(big) + FPN_FAC·mean(ot)``;
the meta term is clamped at 0 when negative, gated off before
``EFFECT_AFER_EP_PERCENT`` of epoch 1 (buffer still updates), and skipped
entirely when no small statistics exist this step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .optim import clip_global_norm, make_optimizer, trainable_mask

EPS = 1e-20


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    buffer: jax.Array        # [BUFFER_SIZE, 1024, K]
    buffer_cnt: jax.Array    # [BUFFER_SIZE, 1, K]


def init_buffer(buffer_size: int, num_classes: int, feat_dim: int = 1024):
    """Zero buffer (parity: initialize_buffer 'scratch', model.py:106-115)."""
    return (
        jnp.zeros((buffer_size, feat_dim, num_classes), jnp.float32),
        jnp.zeros((buffer_size, 1, num_classes), jnp.float32),
    )


def create_train_state(cfg, variables) -> TrainState:
    params = variables["params"]
    tx = make_optimizer(cfg, params)
    buf, cnt = init_buffer(
        cfg.DEV.BUFFER_SIZE if cfg.DEV.SWITCH else 1, cfg.DATASET.NUM_CLASSES)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        buffer=buf,
        buffer_cnt=cnt,
    )


def sum_diagnostics(mutated, name: str) -> jnp.ndarray:
    """Sum every 'diagnostics'-collection leaf called ``name`` (float32
    scalar; 0 when the collection is absent/empty). The counters are sown
    per-module (models/intertwiner.py::_sow_unfit_overflow), so a forward
    with several Dev calls yields several leaves."""
    diag = (mutated or {}).get("diagnostics", {})
    total = jnp.zeros((), jnp.float32)
    for path, leaf in jax.tree_util.tree_flatten_with_path(diag)[0]:
        if any(getattr(k, "key", None) == name for k in path):
            total = total + jnp.asarray(leaf, jnp.float32)
    return total


def _merge_stats(feat, cnt, axis_name: Optional[str]):
    """Merge [S, D, K] stats over scales (and devices): weighted mean.

    Parity: _merge_feat_vec (model.py:218-224) + DataParallel's gpu dim."""
    wsum = jnp.sum(feat * cnt, axis=0)          # [D, K]
    csum = jnp.sum(cnt, axis=0)                 # [1, K]
    if axis_name is not None:
        wsum = jax.lax.psum(wsum, axis_name)
        csum = jax.lax.psum(csum, axis_name)
    return wsum / (csum + EPS), csum


def intertwiner_meta(
    cfg_dev: Dict[str, Any],
    buffer: jax.Array,
    buffer_cnt: jax.Array,
    stats: Dict[str, jax.Array],
    axis_name: Optional[str] = None,
    meta_ot_fn=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Buffer update + meta loss. Returns (loss, new_buffer, new_buffer_cnt).

    ``cfg_dev``: dict(buffer_size, loss_choice, inst_loss).
    ``stats``: the Dev outputs (big/small feat+cnt, small_out, small_gt).
    ``meta_ot_fn(small, big, weights)``: bound OT module (loss_choice='ot').
    """
    buffer_size = cfg_dev["buffer_size"]
    loss_choice = cfg_dev["loss_choice"]
    inst_loss = cfg_dev["inst_loss"]

    big_merged, big_csum = _merge_stats(
        stats["big_feat"], stats["big_cnt"], axis_name)

    # Reference guard: only update/compute when small stats exist anywhere
    # (workflow.py:192-196). Under SPMD the guard must agree across devices.
    small_sum = jnp.sum(stats["small_feat"])
    if axis_name is not None:
        small_sum = jax.lax.psum(small_sum, axis_name)
    has_small = (small_sum != 0).astype(jnp.float32)

    if buffer_size == 1:
        feat_sum = buffer * buffer_cnt + big_merged[None] * big_csum[None]
        new_cnt = buffer_cnt + big_csum[None]
        new_buffer = feat_sum / (new_cnt + EPS)
        final_big = new_buffer[0]                              # [D, K]
        final_big_cnt = new_cnt[0]                             # [1, K]
    else:
        new_buffer = jnp.concatenate([buffer[1:], big_merged[None]], axis=0)
        new_cnt = jnp.concatenate([buffer_cnt[1:], big_csum[None]], axis=0)
        final_big = (jnp.sum(new_buffer * new_cnt, axis=0)
                     / (jnp.sum(new_cnt, axis=0) + EPS))
        final_big_cnt = jnp.sum(new_cnt, axis=0)

    # freeze buffer when no small stats this step
    new_buffer = has_small * new_buffer + (1 - has_small) * buffer
    new_cnt = has_small * new_cnt + (1 - has_small) * buffer_cnt

    if inst_loss:
        # instance level: every small RoI with class>0 present in the buffer
        small_out = stats["small_out"]                         # [N, D]
        small_gt = stats["small_gt"].astype(jnp.int32)         # [N]
        in_buffer = final_big_cnt[0][small_gt] > 0             # [N]
        w = ((small_gt > 0) & in_buffer).astype(jnp.float32)
        # the reliable side always comes from the (gradient-free) buffer
        big_rows = jax.lax.stop_gradient(final_big).T[small_gt]  # [N, D]
        small_rows = small_out
    else:
        small_merged, small_csum = _merge_stats(
            stats["small_feat"], stats["small_cnt"], axis_name)
        small_csum = small_csum.at[0, 0].set(0.0)  # drop background
        present = (small_csum[0] > 0) & (final_big_cnt[0] > 0)  # [K]
        w = present.astype(jnp.float32)
        small_rows = small_merged.T                             # [K, D]
        big_rows = jax.lax.stop_gradient(final_big).T           # [K, D]

    wm = w[:, None]
    denom = jnp.maximum(jnp.sum(wm) * small_rows.shape[1], 1.0)
    if loss_choice == "l2":
        loss = jnp.sum(((small_rows - big_rows) ** 2) * wm) / denom
    elif loss_choice == "l1":
        loss = jnp.sum(jnp.abs(small_rows - big_rows) * wm) / denom
    elif loss_choice == "kl":
        # torch F.kl_div(log(SMALL), BIG), mean over elements (model.py:201)
        kl = big_rows * (jnp.log(big_rows + EPS) - jnp.log(small_rows + EPS))
        loss = jnp.sum(kl * wm) / denom
    elif loss_choice == "ot":
        loss = meta_ot_fn(small_rows, big_rows, w)
    else:
        raise ValueError(loss_choice)

    loss = loss * has_small
    # negative meta-loss clamps to zero (workflow.py:196-200)
    loss = jnp.where(loss < 0, 0.0, loss)
    return loss, new_buffer, new_cnt


def _path_key(entry):
    """Normalize a tree-path entry (DictKey/GetAttrKey/SequenceKey) to its
    plain value so paths from different container kinds compare equal."""
    tu = jax.tree_util
    if isinstance(entry, tu.DictKey):
        return entry.key
    if isinstance(entry, tu.GetAttrKey):
        return entry.name
    if isinstance(entry, tu.SequenceKey):
        return entry.idx
    if isinstance(entry, tu.FlattenedIndexKey):
        return entry.key
    return str(entry)


def freeze_opt_state(new_opt, old_opt, mask):
    """Keep optimizer state untouched for frozen params.

    Param-structured optimizer-state leaves are identified **by tree path**:
    a state leaf whose path suffix equals a parameter's path (e.g. the trace
    leaf ``opt_state[1].trace['fpn']['p5_lateral']['kernel']`` ends with the
    mask path ``fpn/p5_lateral/kernel``) follows that parameter's trainable
    mask; every other leaf (step counters, global statistics) takes the new
    value. Longest-suffix match wins so nested param subtrees can't alias.

    Unlike positional alignment, this stays correct for optax chains whose
    state does not walk the full param tree in order — e.g. an
    ``optax.masked`` inner state that materializes leaves for only a subset
    of params (the rest are leafless ``MaskedNode``s).
    """
    mask_paths = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_path = {tuple(_path_key(k) for k in p): v for p, v in mask_paths}
    depths = sorted({len(p) for p in by_path}, reverse=True)

    new_paths, treedef = jax.tree_util.tree_flatten_with_path(new_opt)
    old_flat = jax.tree_util.tree_leaves(old_opt)
    assert len(new_paths) == len(old_flat), "opt-state structures differ"
    out = []
    for (path, nl), ol in zip(new_paths, old_flat):
        keys = tuple(_path_key(k) for k in path)
        m = None
        for d in depths:
            if len(keys) >= d and keys[-d:] in by_path:
                m = by_path[keys[-d:]]
                break
        if m is None:
            out.append(nl)          # not per-param state (counter/global)
        elif isinstance(m, (bool, np.bool_)):
            out.append(nl if m else ol)   # static mask: no select op emitted
        else:
            out.append(jnp.where(m, nl, ol))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_train_step(model, cfg, layers: str = "all",
                    axis_name: Optional[str] = None):
    """Build the jittable train step.

    step(state, batch, lr, meta_gate, rng) -> (state, metrics)
    batch: dict(images, gt_class_ids, gt_boxes, gt_masks).
    ``lr`` scalar; ``meta_gate`` scalar 0/1 (EFFECT_AFER_EP_PERCENT gating).
    """
    tx = None  # built lazily against the param tree
    dev_cfg = {
        "buffer_size": cfg.DEV.BUFFER_SIZE,
        "loss_choice": cfg.DEV.LOSS_CHOICE,
        "inst_loss": cfg.DEV.INST_LOSS,
    }
    use_dev = cfg.DEV.SWITCH and not cfg.DEV.BASELINE
    loss_fac = cfg.DEV.LOSS_FAC
    big_fac = cfg.DEV.BIG_LOSS_FAC if cfg.DEV.BIG_SUPERVISE else 0.0
    fpn_ot_fac = cfg.TRAIN.FPN_OT_LOSS_FAC if cfg.TRAIN.FPN_OT_LOSS else 0.0
    dis_reg = cfg.DEV.DIS_REG_LOSS
    clip_grad = cfg.TRAIN.CLIP_GRAD
    max_norm = cfg.TRAIN.MAX_GRAD_NORM
    bn_learn = bool(cfg.TRAIN.BN_LEARN)

    def train_step(state: TrainState, batch, lr, meta_gate, rng):
        nonlocal tx
        if tx is None:
            tx = make_optimizer(cfg, state.params)
        tmask = trainable_mask(state.params, layers)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            new_stats = state.batch_stats
            # 'diagnostics' carries the window-RoIAlign unfit-overflow
            # counter (models/intertwiner.py::_sow_unfit_overflow) —
            # surfaced into metrics so silent tap-truncation is visible
            if bn_learn:
                # BN learns batch statistics (TRAIN.BN_LEARN — the capability
                # the reference gates at utils.py:478-481; its default quirk
                # keeps BN frozen, SURVEY.md §3.5 #1)
                out, mutated = model.apply(
                    variables, batch["images"], mode="train",
                    gt_class_ids=batch["gt_class_ids"],
                    gt_boxes=batch["gt_boxes"], gt_masks=batch["gt_masks"],
                    rngs={"sampling": rng}, train_bn=True,
                    mutable=["batch_stats", "diagnostics"])
                new_stats = mutated["batch_stats"]
            else:
                out, mutated = model.apply(
                    variables, batch["images"], mode="train",
                    gt_class_ids=batch["gt_class_ids"],
                    gt_boxes=batch["gt_boxes"], gt_masks=batch["gt_masks"],
                    rngs={"sampling": rng}, mutable=["diagnostics"])
            roi_overflow = sum_diagnostics(mutated, "roi_unfit_overflow")

            detailed = {
                k: out[k] for k in (
                    "rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
                    "mrcnn_bbox_loss", "mrcnn_mask_loss")
            }
            if dis_reg:
                # DEBUG flag parity (workflow.py:185-188): the reference
                # zeroes `detailed_loss.data[i]` IN VALUE ONLY — the autograd
                # graph is intact, so those heads keep training while the
                # reported/total value excludes them. x - stop_gradient(x)
                # reproduces exactly that (value 0, gradient 1).
                for k in ("rpn_bbox_loss", "mrcnn_bbox_loss",
                          "mrcnn_mask_loss"):
                    detailed[k] = detailed[k] - jax.lax.stop_gradient(
                        detailed[k])

            total = sum(detailed.values())

            meta = jnp.zeros(())
            new_buf, new_cnt = state.buffer, state.buffer_cnt
            big_loss = jnp.zeros(())
            if use_dev and "intertwiner" in out:
                tw = out["intertwiner"]
                meta_ot_fn = None
                if cfg.DEV.LOSS_CHOICE == "ot":
                    def meta_ot_fn(s, b, w):
                        return model.apply(
                            variables, s, b, w, method="meta_ot")
                meta, new_buf, new_cnt = intertwiner_meta(
                    dev_cfg, state.buffer, state.buffer_cnt, tw,
                    axis_name=axis_name, meta_ot_fn=meta_ot_fn)
                total = total + meta_gate * loss_fac * meta
                big_loss = jnp.mean(tw["big_loss"])
                total = total + big_fac * big_loss

            fpn_ot = jnp.mean(out["fpn_ot_loss"])
            total = total + fpn_ot_fac * fpn_ot

            metrics = dict(detailed, total_loss=total, meta_loss=meta,
                           big_loss=big_loss, fpn_ot_loss=fpn_ot,
                           roi_unfit_overflow=roi_overflow)
            return total, (metrics, new_buf, new_cnt, new_stats)

        grads, (metrics, new_buf, new_cnt, new_stats) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        # Zero frozen-param grads FIRST: torch's requires_grad=False leaves
        # p.grad None, so frozen params contribute neither to the clip norm
        # nor to optimizer-state accumulation.
        grads = jax.tree_util.tree_map(
            lambda g, m: jnp.where(m, g, 0.0), grads, tmask)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            # the overflow COUNTER is a whole-batch total (psum), matching
            # the eval path (data_parallel.py make_parallel_eval_step) and
            # the single-device closure — the blanket pmean below would
            # silently turn it into a per-device average (ADVICE r4)
            metrics["roi_unfit_overflow"] = jax.lax.psum(
                metrics["roi_unfit_overflow"], axis_name)
            metrics = {
                k: (v if k == "roi_unfit_overflow"
                    else jax.lax.pmean(v, axis_name))
                for k, v in metrics.items()}
            if bn_learn:
                # per-device batch shards produce per-device BN statistics;
                # keep the replicated-state invariant (cross-replica BN mean)
                new_stats = jax.lax.pmean(new_stats, axis_name)
        if clip_grad:
            grads, gnorm = clip_global_norm(grads, max_norm)
            metrics["grad_norm"] = gnorm

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # frozen params keep their exact optimizer state (torch parity:
        # no momentum/decay accumulation while requires_grad=False — the
        # weight-decay term would otherwise leak into trace via updates)
        new_opt = freeze_opt_state(new_opt, state.opt_state, tmask)
        # stage-wise freezing + torch-SGD lr position (optim.py docstring)
        updates = jax.tree_util.tree_map(
            lambda u, m: jnp.where(m, -lr * u, 0.0), updates, tmask)
        new_params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=jax.lax.stop_gradient(new_stats),
            opt_state=new_opt,
            buffer=jax.lax.stop_gradient(new_buf),
            buffer_cnt=jax.lax.stop_gradient(new_cnt),
        )
        return new_state, metrics

    return train_step

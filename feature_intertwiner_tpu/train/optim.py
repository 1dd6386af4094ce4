"""Optimizer, LR schedule, and stage-wise parameter freezing.

Parity with ``set_optimizer`` / ``adjust_lr``
(``/root/reference/tools/utils.py:474-522``):

- SGD momentum 0.9 with weight decay that *skips BatchNorm parameters*
  (unless BN_LEARN); Adam and RMSprop variants;
- torch-SGD update order (velocity on raw grad+wd, lr applied after) —
  reproduced with ``add_decayed_weights → trace → scale(lr)``;
- LR: optional epoch-1 linear warmup over LR_WP_ITER iters from
  ``INIT_LR·LR_WP_FACTOR``, then ``steps_with_decay``: γ^(#stage boundaries
  passed) with boundaries at the cumulative stage schedule;
- stage-wise freezing by regex over parameter paths (``set_trainable``,
  lib/model.py:117-141 / LAYER_REGEX): frozen params get exactly zero
  updates (matching requires_grad=False).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..config import LAYER_REGEX


def param_paths(params) -> Dict[str, Any]:
    """Flatten a param pytree to {'a/b/c': leaf}."""
    flat = traverse_util.flatten_dict(params)
    return {"/".join(k): v for k, v in flat.items()}


def _mask_from_predicate(params, predicate: Callable[[str], bool]):
    flat = traverse_util.flatten_dict(params)
    out = {k: predicate("/".join(k)) for k in flat}
    return traverse_util.unflatten_dict(out)


def trainable_mask(params, layers: str):
    """Boolean pytree: True where the stage regex matches the param path.

    ``layers`` is a LAYER_REGEX key ('heads', '3+', '4+', '5+', 'all') or a
    raw regex. Matched with re.fullmatch like the reference."""
    regex = LAYER_REGEX.get(layers, layers)
    pat = re.compile(regex)
    return _mask_from_predicate(params, lambda p: bool(pat.fullmatch(p)))


def bn_mask(params, exclude_bn: bool = True):
    """Weight-decay mask: False on BatchNorm params (path contains 'bn' —
    the reference's substring test, utils.py:486-489).

    Documented divergence: the reference tests *torch* parameter names, where
    BNs buried in nn.Sequential (the Dev make-up layers, OT-critic BNs) are
    numerically indexed and therefore NOT excluded — an artifact of module
    naming, not intent. Here every BN path contains 'bn', so the stated
    intent (no L2 on any BN scale/bias) is applied uniformly."""
    if not exclude_bn:
        return _mask_from_predicate(params, lambda p: True)
    return _mask_from_predicate(params, lambda p: "bn" not in p.lower())


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    """Gradient transformation WITHOUT the lr scale — the train step applies
    ``-lr`` afterwards so the schedule stays a cheap scalar input."""
    method = cfg.TRAIN.OPTIM_METHOD
    wd = cfg.TRAIN.WEIGHT_DECAY
    if method == "sgd":
        decay_mask = bn_mask(params, exclude_bn=not cfg.TRAIN.BN_LEARN)
        return optax.chain(
            optax.masked(optax.add_decayed_weights(wd), decay_mask),
            optax.trace(decay=cfg.TRAIN.MOMENTUM, nesterov=False),
        )
    if method == "adam":
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_adam(b1=0.9, b2=0.999),
        )
    if method == "rmsprop":
        # centered RMSprop like the reference's torch.optim.RMSprop(...,
        # alpha=0.9, centered=True) (utils.py:498-500; note that branch reads
        # the nonexistent `opt.lr` there and would crash if ever selected).
        # optax adds eps inside the sqrt where torch adds it outside —
        # negligible at eps=1e-8.
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.scale_by_stddev(decay=0.9),
            optax.trace(decay=cfg.TRAIN.MOMENTUM),
        )
    raise ValueError(f"unknown optimizer {method!r}")


def learning_rate(cfg, epoch: int, iter_in_epoch: int) -> float:
    """Host-side LR (parity: adjust_lr, utils.py:504-522). 1-based epoch/iter."""
    t = cfg.TRAIN
    if t.LR_WARM_UP and epoch == 1 and iter_in_epoch <= t.LR_WP_ITER:
        if t.LR_WP_ITER <= 1:
            return t.INIT_LR
        a = t.INIT_LR * (1 - t.LR_WP_FACTOR) / (t.LR_WP_ITER - 1)
        b = t.INIT_LR * t.LR_WP_FACTOR - a
        return a * iter_in_epoch + b
    boundaries = np.cumsum(t.SCHEDULE)
    decay = t.GAMMA ** int(np.sum(epoch > boundaries))
    return t.INIT_LR * decay


def clip_global_norm(grads, max_norm: float):
    """Global-norm clip (parity: torch clip_grad_norm 5.0, workflow.py:228)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    factor = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * factor, grads), norm

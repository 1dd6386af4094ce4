"""Orbax checkpoint / resume.

Capability parity with ``save_model`` / ``update_config_and_load_model``
(``/root/reference/tools/utils.py:250-471, 567-586``): the checkpoint payload
carries (params, batch_stats, opt_state, **intertwiner buffer + counts**,
step) plus epoch/iter metadata; resume resolves the newest checkpoint under
``results/<config>/train`` (``_find_last``), with explicit-path and
pretrained-file alternatives; buffer-size mismatches fall back to a fresh
buffer (utils.py:374-389).
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

from .step import TrainState

CKPT_RE = re.compile(r"ckpt_ep(\d+)_iter(\d+)$")

_async_ckpt = None


def _checkpointer() -> ocp.AsyncCheckpointer:
    """Process-wide async checkpointer: the disk write runs on a background
    thread so intra-epoch saves (SAVE_FREQ_WITHIN_EPOCH=10) don't stall the
    train loop. Orbax commits atomically (tmp dir + rename), so readers only
    ever see finished checkpoints."""
    global _async_ckpt
    if _async_ckpt is None:
        import atexit
        _async_ckpt = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        atexit.register(_async_ckpt.wait_until_finished)
    return _async_ckpt


def wait_for_saves():
    if _async_ckpt is not None:
        _async_ckpt.wait_until_finished()


def checkpoint_dir(result_folder: str) -> str:
    return os.path.abspath(os.path.join(result_folder, "checkpoints"))


def prune_old(result_folder: str, keep: int):
    """Delete all but the ``keep`` newest committed checkpoints.

    The reference keeps every epoch's checkpoint on disk
    (``save_model``, tools/utils.py:567-586); at ~0.4 GB per save a long
    multi-arm run fills a disk. ``keep <= 0`` preserves that behavior;
    otherwise the oldest (epoch, iter) dirs beyond ``keep`` are removed.
    Resume always uses the newest (``find_last``), so pruning never
    changes resume semantics."""
    if keep <= 0:
        return
    _prune_to(result_folder, keep)


def _prune_to(result_folder: str, keep: int):
    """Delete all but the ``keep`` newest committed checkpoints
    (``keep=0`` deletes every one — internal; the public knob's 0 means
    'never prune', see :func:`prune_old`).

    Recency for PRUNING is wall-clock (mtime, then epoch/iter as a
    tiebreak), not (epoch, iter): a TRAIN.FORCE_START_EPOCH restart in a
    folder holding higher-epoch checkpoints saves at LOWER epochs — an
    (epoch, iter) sort would delete every new save as "oldest" while the
    stale high-epoch dir survived forever. ``find_last`` keeps the
    reference's by-epoch resume choice (_find_last name-sort,
    utils.py:250-260); mtime pruning retires the stale dir after ``keep``
    new saves, after which the two orders agree again."""
    d = checkpoint_dir(result_folder)
    if not os.path.isdir(d):
        return
    found = []
    for name in os.listdir(d):
        m = CKPT_RE.match(name)
        if m:
            try:
                mtime = os.path.getmtime(os.path.join(d, name))
            except OSError:
                mtime = 0.0
            found.append(((mtime, int(m.group(1)), int(m.group(2))), name))
    import shutil
    drop = sorted(found)[:max(len(found) - keep, 0)]
    for _, name in drop:
        shutil.rmtree(os.path.join(d, name), ignore_errors=True)


def save_checkpoint(result_folder: str, state: TrainState, epoch: int,
                    iter_ind: int, blocking: bool = True, keep: int = 0):
    """``blocking=False`` returns as soon as the device->host snapshot is
    taken; the disk write finishes on a background thread (used for the
    intra-epoch saves in the train loop). The returned path exists only
    once the write commits — find_last/restore_checkpoint wait for it.
    ``keep > 0`` prunes to the ``keep`` newest committed checkpoints before
    the write, so ``keep`` survivors always exist even if this save dies
    mid-write (a keep-1 pre-prune would leave ZERO committed checkpoints in
    that window for keep=1); between saves at most ``keep+1`` exist."""
    path = os.path.join(checkpoint_dir(result_folder),
                        f"ckpt_ep{epoch:04d}_iter{iter_ind:06d}")
    ckpt = _checkpointer()
    ckpt.wait_until_finished()  # at most one save in flight
    if keep > 0:
        # the previous save has committed (the wait above), so the
        # directory is stable; CKPT_RE never matches orbax tmp dirs, so an
        # interrupted write can't be counted as a survivor either
        _prune_to(result_folder, keep)
    payload = serialization.to_state_dict(jax.device_get({
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "buffer": state.buffer,
        "buffer_cnt": state.buffer_cnt,
        "step": state.step,
        "meta": {"epoch": np.int32(epoch), "iter": np.int32(iter_ind)},
    }))
    ckpt.save(path, payload, force=True)
    if blocking:
        ckpt.wait_until_finished()
    return path


def find_last(result_folder: str) -> Optional[str]:
    """Newest checkpoint path (parity: _find_last, utils.py:250-260)."""
    wait_for_saves()
    d = checkpoint_dir(result_folder)
    if not os.path.isdir(d):
        return None
    best, best_key = None, (-1, -1)
    for name in os.listdir(d):
        m = CKPT_RE.match(name)
        if m:
            key = (int(m.group(1)), int(m.group(2)))
            if key > best_key:
                best, best_key = os.path.join(d, name), key
    return best


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int, int]:
    """Restore into ``state``'s structure; returns (state, epoch, iter)."""
    wait_for_saves()
    ckpt = ocp.PyTreeCheckpointer()
    raw = ckpt.restore(path)
    meta = raw.pop("meta")

    if np.asarray(raw["buffer"]).shape != np.asarray(state.buffer).shape:
        # buffer-size mismatch fallback (parity: utils.py:374-389 keeps the
        # weights and re-initializes the buffer on mismatch)
        raw["buffer"] = np.asarray(state.buffer)
        raw["buffer_cnt"] = np.asarray(state.buffer_cnt)

    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "buffer": state.buffer,
        "buffer_cnt": state.buffer_cnt,
        "step": state.step,
    }
    restored = serialization.from_state_dict(template, raw)
    new_state = state.replace(**restored)
    return new_state, int(meta["epoch"]), int(meta["iter"])


def resolve_init(cfg, result_folder: str) -> Optional[str]:
    """Resolve the init source (parity: update_config_and_load_model
    utils.py:271-313): explicit file > last checkpoint > pretrained paths."""
    choice = cfg.MODEL.INIT_FILE_CHOICE
    if choice and os.path.exists(str(choice)) and choice != "last":
        return str(choice)
    last = find_last(result_folder)
    if last:
        return last
    # inference/visualize phases: checkpoints live under the run's TRAIN
    # folder — the reference always resolves results/<name>/train
    # (_find_last, utils.py:250-260) regardless of phase. Without this, a
    # standalone `--phase inference` silently evaluated random weights.
    if os.path.basename(result_folder.rstrip("/")) != "train":
        last = find_last(
            os.path.join(os.path.dirname(result_folder.rstrip("/")), "train"))
        if last:
            return last
    if choice == "coco_pretrain" and os.path.exists(cfg.MODEL.PRETRAIN_COCO_MODEL):
        return cfg.MODEL.PRETRAIN_COCO_MODEL
    if choice == "imagenet_pretrain" and os.path.exists(
            cfg.MODEL.PRETRAIN_IMAGENET_MODEL):
        return cfg.MODEL.PRETRAIN_IMAGENET_MODEL
    return None

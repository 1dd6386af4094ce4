"""End-to-end workflow integration (the QUICK_VERIFY equivalent, SURVEY §4):
synthetic COCO data → Trainer(train_epoch) → checkpoint → test_model(COCOeval).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.config import build_config
from feature_intertwiner_tpu.data import get_data, synthetic
from feature_intertwiner_tpu.models import InterNet
from feature_intertwiner_tpu.train import checkpoint as ckpt
from feature_intertwiner_tpu.train.workflow import (
    Trainer, mold_inputs, train_epoch, unmold_detections)
from feature_intertwiner_tpu.train.workflow import test_model as run_eval

IMG = 128


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cocodata")
    synthetic.generate(str(root), num_images=4, size=(100, 140), seed=3)
    cfg = build_config()
    cfg.CTRL.QUICK_VERIFY = True
    cfg.MODEL.BACKBONE = "resnet50"
    cfg.DATA.IMAGE_MIN_DIM = 96
    cfg.DATA.IMAGE_MAX_DIM = IMG
    cfg.DATA.MAX_GT_INSTANCES = 8
    cfg.RPN.ANCHOR_SCALES = (8, 16, 32, 64, 128)
    cfg.RPN.PRE_NMS_LIMIT = 200
    cfg.RPN.POST_NMS_ROIS_INFERENCE = 48
    cfg.ROIS.TRAIN_ROIS_PER_IMAGE = 24
    cfg.TEST.DET_MAX_INSTANCES = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.SCHEDULE = [1, 0, 0]
    cfg.DEV.SWITCH = True
    cfg.DEV.LOSS_CHOICE = "l2"
    cfg.DEV.UPSAMPLE_FAC = 1.0
    cfg.DEV.BUFFER_SIZE = 2
    cfg.DATA.LOADER_WORKER_NUM = 2
    cfg.finalize()
    cfg.MISC.RESULT_FOLDER = str(tmp_path_factory.mktemp("results"))

    loader, val, val_api = get_data(cfg, data_root=str(root))
    cfg.DATASET.NUM_CLASSES = val.num_classes

    model = InterNet.from_config(cfg)
    g = cfg.DATA.MAX_GT_INSTANCES
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.zeros((1, IMG, IMG, 3)), mode="train",
        gt_class_ids=jnp.zeros((1, g), jnp.int32),
        gt_boxes=jnp.zeros((1, g, 4)),
        gt_masks=jnp.zeros((1, g, 56, 56)))
    return cfg, loader, val, val_api, model, variables


@pytest.mark.slow
def test_train_epoch_and_eval_roundtrip(env):
    cfg, loader, val, val_api, model, variables = env
    trainer = Trainer(model, cfg, variables, mesh=None)
    train_epoch(trainer, loader, "all", epoch=1, stage_name="ALL",
                epoch_str="[Ep 1/1]")
    assert int(trainer.state.step) == len(loader)

    path = ckpt.save_checkpoint(cfg.MISC.RESULT_FOLDER, trainer.state, 1, 2)
    assert os.path.exists(path)
    assert ckpt.find_last(cfg.MISC.RESULT_FOLDER) == path

    # restore into a fresh trainer and verify params match
    t2 = Trainer(model, cfg, variables, mesh=None)
    restored, ep, it = ckpt.restore_checkpoint(path, t2.state)
    assert (ep, it) == (1, 2)
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # eval loop end-to-end with COCOeval
    eval_vars = {"params": restored.params}
    if restored.batch_stats:
        eval_vars["batch_stats"] = restored.batch_stats
    stats = run_eval(model, eval_vars, cfg, val, val_api, epoch=1)
    assert stats.shape == (12,)
    # det-result cache written; rerun hits cache
    import glob
    caches = glob.glob(
        os.path.join(cfg.MISC.RESULT_FOLDER, "det_result_ep0001_n*.json"))
    assert caches, "expected a det-result cache keyed by epoch+image count"
    def _val_ap_records():
        mpath = os.path.join(cfg.MISC.RESULT_FOLDER, "metrics.jsonl")
        with open(mpath) as f:
            return [r for r in map(json.loads, f) if "AP" in r]

    n_ap = len(_val_ap_records())
    stats2 = run_eval(model, eval_vars, cfg, val, val_api, epoch=1)
    np.testing.assert_allclose(stats, stats2)
    # a cache-hit re-eval must not duplicate the dashboard's val-AP point
    assert len(_val_ap_records()) == n_ap
    # a different image count must NOT reuse the cache (it would silently
    # zero the uncached images); the limited run writes its own file
    run_eval(model, eval_vars, cfg, val, val_api, epoch=1, limit=1)
    assert glob.glob(
        os.path.join(cfg.MISC.RESULT_FOLDER, "det_result_ep0001_n1.json"))


def test_np_greedy_nms_and_fusion():
    from feature_intertwiner_tpu.train.workflow import (
        _np_greedy_nms, fuse_multiscale)
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = _np_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, [0, 2])

    # two "scales" with an overlapping duplicate of the top box and a
    # different-class box at the same location (must NOT suppress across class)
    s1 = (boxes, np.array([1, 1, 2]), scores, [None] * 3)
    s2 = (np.array([[0, 0, 10, 10]], np.float32), np.array([3]),
          np.array([0.85], np.float32), [None])
    fb, fc, fs, fm = fuse_multiscale([s1, s2], max_instances=10, thresh=0.5)
    assert len(fb) == 3  # class-1 winner, class-2 box, class-3 box
    assert list(fs) == sorted(fs, reverse=True)
    assert set(fc.tolist()) == {1, 2, 3}

    fb, fc, fs, fm = fuse_multiscale([s1, s2], max_instances=2, thresh=0.5)
    assert len(fb) == 2 and fs[0] >= fs[1]


@pytest.mark.slow
def test_multiscale_eval(env):
    """Multi-scale testing path: per-scale inference + cross-scale fusion
    through the full COCOeval loop."""
    cfg, loader, val, val_api, model, variables = env
    cfg.TEST.MULTI_SCALE = [96, 128]
    try:
        stats = run_eval(model, variables, cfg, val, val_api, epoch=77)
    finally:
        cfg.TEST.MULTI_SCALE = []
    assert stats.shape == (12,)
    import glob
    assert glob.glob(os.path.join(
        cfg.MISC.RESULT_FOLDER, "det_result_ep0077_n*_ms*.json"))


@pytest.mark.slow
def test_fp32_eval_dtype_clone(env):
    """TEST.DTYPE-style eval: the bf16 model re-typed to fp32 runs with the
    same variables and produces finite detections."""
    cfg, loader, val, val_api, model, variables = env
    bf16 = model.clone(dtype=jnp.bfloat16)
    fp32 = bf16.clone(dtype=jnp.float32)
    img = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    win = jnp.array([[0, 0, IMG, IMG]], jnp.float32)
    out = fp32.apply(variables, img, mode="inference", windows=win)
    assert np.isfinite(np.asarray(out["detections"])).all()


@pytest.mark.slow
def test_mold_unmold_roundtrip(env):
    cfg = env[0]
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 140, 3)).astype(np.uint8)
    molded, metas, windows = mold_inputs([img], cfg)
    assert molded.shape == (1, IMG, IMG, 3)
    wy1, wx1, wy2, wx2 = windows[0]
    # a detection covering the full window maps back to the full image
    det = np.array([[wy1, wx1, wy2, wx2, 1, 0.9]], np.float32)
    boxes, cls, scores, _ = unmold_detections(
        det, None, img.shape, windows[0], cfg)
    np.testing.assert_array_equal(boxes[0], [0, 0, 100, 140])


@pytest.mark.slow
def test_resume_from_pretrained_npz(env, tmp_path):
    """MODEL.INIT_FILE_CHOICE pointing at a converted .npz must actually load
    the weights (strict=False overlay), not silently start from scratch."""
    cfg, loader, val, val_api, model, variables = env
    from flax import traverse_util

    # build an npz in the converter CLI's format from doctored params
    flat = {"/".join(k): np.asarray(v) for k, v in
            traverse_util.flatten_dict(variables["params"]).items()}
    key = "fpn/p5_lateral/kernel"
    doctored = dict(flat)
    doctored[key] = np.full_like(flat[key], 0.123)
    npz_path = str(tmp_path / "pretrain.npz")
    np.savez(npz_path, **{f"params/{k}": v for k, v in doctored.items()})

    old_choice, old_folder = cfg.MODEL.INIT_FILE_CHOICE, cfg.MISC.RESULT_FOLDER
    cfg.MODEL.INIT_FILE_CHOICE = npz_path
    cfg.MISC.RESULT_FOLDER = str(tmp_path)  # no checkpoints here
    try:
        trainer = Trainer(model, cfg, variables, mesh=None).resume()
    finally:
        cfg.MODEL.INIT_FILE_CHOICE = old_choice
        cfg.MISC.RESULT_FOLDER = old_folder
    loaded = traverse_util.flatten_dict(trainer.state.params)
    got = np.asarray(loaded[tuple(key.split("/"))])
    np.testing.assert_allclose(got, 0.123)
    assert trainer.epoch == 1  # pretrained init is not a resume point


@pytest.mark.slow
def test_profile_analysis_flag(env, capsys):
    """CTRL.PROFILE_ANALYSIS produces fetch/step phase reports."""
    cfg, loader, val, val_api, model, variables = env
    cfg.CTRL.PROFILE_ANALYSIS = True
    try:
        trainer = Trainer(model, cfg, variables, mesh=None)
        train_epoch(trainer, loader, "all", epoch=1, stage_name="ALL",
                    epoch_str="[Ep 1/1]")
    finally:
        cfg.CTRL.PROFILE_ANALYSIS = False
    out = capsys.readouterr().out
    assert "[profile] fetch:" in out and "[profile] step:" in out


@pytest.mark.slow
def test_eval_under_mesh_matches_single_device(env):
    """SPMD eval (the reference's DataParallel test_model): sharded inference
    must produce the same COCOeval stats as single-device."""
    from feature_intertwiner_tpu.parallel import make_mesh
    cfg, loader, val, val_api, model, variables = env
    single = run_eval(model, variables, cfg, val, val_api, epoch=55)
    mesh = make_mesh(2)
    sharded = run_eval(model, variables, cfg, val, val_api, epoch=56,
                       mesh=mesh)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-6)


@pytest.mark.slow
def test_end_of_epoch_resume_rolls_over(env):
    """Resuming from an end-of-epoch checkpoint (iter == len(loader), so the
    restored iter is len+1) must advance to the next epoch instead of
    draining the whole loader with every iteration skipped."""
    from feature_intertwiner_tpu.train.workflow import train_model

    cfg, loader, val, val_api, model, variables = env
    trainer = Trainer(model, cfg, variables, mesh=None)
    trainer.epoch, trainer.iter = 1, len(loader) + 1  # end-of-ep-1 restore
    train_model(trainer, loader, "heads")  # SCHEDULE [1,0,0]: stage ends ep 1
    assert trainer.epoch == 2 and trainer.iter == 1
    assert int(trainer.state.step) == 0, "no iterations may run (or be drained)"


def test_prune_old_keeps_newest(tmp_path):
    """TRAIN.KEEP_CHECKPOINTS: only the N newest (epoch, iter) dirs survive;
    keep=0 preserves everything (the reference keeps every epoch's save)."""
    d = tmp_path / "checkpoints"
    d.mkdir()
    names = ["ckpt_ep0001_iter000075", "ckpt_ep0002_iter000010",
             "ckpt_ep0002_iter000075", "ckpt_ep0010_iter000005"]
    for n in names:
        (d / n).mkdir()
    (d / "ckpt_ep0003_iter000001.orbax-checkpoint-tmp-x").mkdir()  # uncommitted

    ckpt.prune_old(str(tmp_path), keep=0)
    assert sorted(os.listdir(d)) == sorted(
        names + ["ckpt_ep0003_iter000001.orbax-checkpoint-tmp-x"])

    ckpt.prune_old(str(tmp_path), keep=2)
    kept = sorted(n for n in os.listdir(d) if ckpt.CKPT_RE.match(n))
    assert kept == ["ckpt_ep0002_iter000075", "ckpt_ep0010_iter000005"]
    assert ckpt.find_last(str(tmp_path)).endswith("ckpt_ep0010_iter000005")

    # save_checkpoint prunes to keep (NOT keep-1) pre-write: a crash
    # mid-write must always leave `keep` committed checkpoints on disk —
    # with keep=1 a pre-write prune-to-0 would leave none
    ckpt._prune_to(str(tmp_path), 1)
    assert [n for n in os.listdir(d) if ckpt.CKPT_RE.match(n)] == \
        ["ckpt_ep0010_iter000005"]
    ckpt._prune_to(str(tmp_path), 0)
    assert [n for n in os.listdir(d) if ckpt.CKPT_RE.match(n)] == []

    # FORCE_START_EPOCH restart: a stale HIGH-epoch dir from a prior run
    # must be pruned as oldest (recency = mtime), not protected by its
    # epoch number while every new low-epoch save gets deleted
    (d / "ckpt_ep0020_iter000075").mkdir()
    os.utime(d / "ckpt_ep0020_iter000075", (1_000_000, 1_000_000))
    for n in ["ckpt_ep0001_iter000075", "ckpt_ep0002_iter000075"]:
        (d / n).mkdir()
    ckpt._prune_to(str(tmp_path), 2)
    kept = sorted(n for n in os.listdir(d) if ckpt.CKPT_RE.match(n))
    assert kept == ["ckpt_ep0001_iter000075", "ckpt_ep0002_iter000075"]


def test_resolve_init_falls_back_to_train_folder(tmp_path):
    """A standalone --phase inference run must resume the TRAIN folder's
    last checkpoint (parity: _find_last always resolves
    results/<name>/train, utils.py:250-260). Regression: resolve_init only
    searched the phase's own folder, so a fresh inference phase silently
    evaluated random weights."""
    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.train import checkpoint as ckpt

    d = tmp_path / "name" / "train" / "checkpoints" / "ckpt_ep0003_iter000007"
    d.mkdir(parents=True)
    cfg = build_config()
    cfg.MODEL.INIT_FILE_CHOICE = "last"
    got = ckpt.resolve_init(cfg, str(tmp_path / "name" / "inference"))
    assert got and got.endswith("ckpt_ep0003_iter000007")
    # the train phase itself still resolves its own folder
    got2 = ckpt.resolve_init(cfg, str(tmp_path / "name" / "train"))
    assert got2 and got2.endswith("ckpt_ep0003_iter000007")

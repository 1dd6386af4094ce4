"""Tests for visualization, t-SNE, profiling, logging utilities."""

import os

import numpy as np

from feature_intertwiner_tpu.utils.logging import (
    MetricsLogger, compute_eta, format_loss_line, print_log)
from feature_intertwiner_tpu.utils.profiling import PhaseTimer, memory_probe
from feature_intertwiner_tpu.utils.tsne import plot_embedding, tsne_embed
from feature_intertwiner_tpu.utils.visualize import (
    display_instances, plot_loss_curves)


def test_print_log_tee(tmp_path):
    f = str(tmp_path / "log.txt")
    print_log("hello", f, init=True)
    print_log("world", f)
    assert open(f).read() == "hello\nworld\n"


def test_metrics_logger_roundtrip(tmp_path):
    ml = MetricsLogger(str(tmp_path / "m.jsonl"))
    ml.log(epoch=1, total_loss=2.5)
    ml.log(epoch=1, total_loss=2.0)
    recs = ml.read()
    assert len(recs) == 2 and recs[1]["total_loss"] == 2.0


def test_format_loss_line():
    line = format_loss_line("ALL", "[Ep 001/1]", 10, 100, 0.01,
                            {"total_loss": 1.5, "rpn_class_loss": 0.2}, 0.5)
    assert "total 1.5000" in line and "lr 0.01000" in line
    assert compute_eta(1.0, 90) == "0:01:30"


def test_display_instances(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 50]])
    masks = np.zeros((1, 64, 64), np.uint8)
    masks[0, 12:30, 12:40] = 1
    path = display_instances(
        img, boxes, np.array([1]), ["BG", "thing"], scores=np.array([0.9]),
        masks=masks, save_path=str(tmp_path / "det.png"))
    assert os.path.exists(path)


def test_plot_loss_curves(tmp_path):
    metrics = [{"total_loss": 3.0 - i * 0.1, "meta_loss": 0.5}
               for i in range(20)]
    path = plot_loss_curves(metrics, str(tmp_path / "loss.png"))
    assert os.path.exists(path)


def test_tsne_embed_and_plot(tmp_path, rng):
    feats = np.concatenate([
        rng.randn(20, 32) + 5, rng.randn(20, 32) - 5]).astype(np.float32)
    cls = np.array([1] * 20 + [2] * 20)
    emb = tsne_embed(feats, perplexity=5, n_iter=60)
    assert emb.shape == (40, 2)
    path = plot_embedding(emb, cls, class_names=["BG", "a", "b"],
                          out_path=str(tmp_path / "tsne.png"))
    assert os.path.exists(path)


def test_phase_timer_and_memory_probe(capsys):
    import jax.numpy as jnp
    pt = PhaseTimer()
    with pt.phase("forward"):
        pass
    with pt.phase("forward"):
        pass
    lines = []
    pt.report(lines.append)
    assert any("forward" in l and "2 calls" in l for l in lines)

    memory_probe(lambda x: x * 2, jnp.ones(8), iters=2, log_fn=lines.append)
    assert any("[memory]" in l for l in lines)


def test_tsne_degenerate_sample_counts():
    assert tsne_embed(np.zeros((0, 8))).shape == (0, 2)
    assert tsne_embed(np.zeros((1, 8))).shape == (1, 2)
    out = tsne_embed(np.random.RandomState(0).randn(2, 8), n_iter=20)
    assert out.shape == (2, 2) and np.isfinite(out).all()

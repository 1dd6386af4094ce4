"""RoIAlign parity tests.

Oracle: independent numpy transcription of the TF crop_and_resize sampling
rules (documented in /root/reference/lib/roi_align/src/crop_and_resize.c:44-110).
Gate from BASELINE.md: output parity ≤ 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops.roi_align import (
    assign_fpn_level,
    crop_and_resize,
    crop_and_resize_fused,
    crop_and_resize_pallas,
    crop_and_resize_separable,
    multilevel_crop_and_resize,
)


def np_crop_and_resize(image, boxes, box_ind, crop, extrap=0.0):
    """image [B,H,W,C] -> [N, crop, crop, C]."""
    b, h, w, c = image.shape
    n = len(boxes)
    out = np.full((n, crop, crop, c), extrap, np.float32)
    for k in range(n):
        y1, x1, y2, x2 = boxes[k]
        img = image[box_ind[k]]
        for i in range(crop):
            if crop > 1:
                in_y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (crop - 1)
            else:
                in_y = 0.5 * (y1 + y2) * (h - 1)
            if in_y < 0 or in_y > h - 1:
                continue
            t, bo = int(np.floor(in_y)), int(np.ceil(in_y))
            ly = in_y - t
            for j in range(crop):
                if crop > 1:
                    in_x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (crop - 1)
                else:
                    in_x = 0.5 * (x1 + x2) * (w - 1)
                if in_x < 0 or in_x > w - 1:
                    continue
                l, r = int(np.floor(in_x)), int(np.ceil(in_x))
                lx = in_x - l
                top = img[t, l] + (img[t, r] - img[t, l]) * lx
                bot = img[bo, l] + (img[bo, r] - img[bo, l]) * lx
                out[k, i, j] = top + (bot - top) * ly
    return out


def _setup(rng, b=2, h=24, w=20, c=8, n=16, wild=False):
    image = rng.randn(b, h, w, c).astype(np.float32)
    lo = -0.3 if wild else 0.0
    hi = 1.3 if wild else 1.0
    y1x1 = rng.uniform(lo, hi, (n, 2))
    y2x2 = y1x1 + rng.uniform(0.05, 0.6, (n, 2))
    boxes = np.concatenate([y1x1[:, :1], y1x1[:, 1:], y2x2[:, :1], y2x2[:, 1:]],
                           axis=1).astype(np.float32)
    box_ind = rng.randint(0, b, n).astype(np.int32)
    return image, boxes, box_ind


@pytest.mark.parametrize("crop", [1, 7, 14])
@pytest.mark.parametrize("wild", [False, True])
def test_xla_matches_oracle(rng, crop, wild):
    image, boxes, box_ind = _setup(rng, wild=wild)
    got = np.asarray(crop_and_resize(jnp.array(image), jnp.array(boxes),
                                     jnp.array(box_ind), (crop, crop)))
    want = np_crop_and_resize(image, boxes, box_ind, crop)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_extrapolation_value(rng):
    image, boxes, box_ind = _setup(rng, wild=True)
    got = np.asarray(crop_and_resize(jnp.array(image), jnp.array(boxes),
                                     jnp.array(box_ind), (7, 7),
                                     extrapolation_value=3.5))
    want = np_crop_and_resize(image, boxes, box_ind, 7, extrap=3.5)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_gradient_is_finite_and_correct(rng):
    image, boxes, box_ind = _setup(rng, b=1, h=8, w=8, c=2, n=3)

    def loss(img):
        out = crop_and_resize(img, jnp.array(boxes), jnp.array(box_ind), (5, 5))
        return jnp.sum(out * out)

    g = np.asarray(jax.grad(loss)(jnp.array(image)))
    assert np.isfinite(g).all()
    # directional finite difference
    rngd = np.random.RandomState(1)
    d = rngd.randn(*image.shape).astype(np.float32)
    eps = 1e-3
    f1 = float(loss(jnp.array(image + eps * d)))
    f0 = float(loss(jnp.array(image - eps * d)))
    fd = (f1 - f0) / (2 * eps)
    np.testing.assert_allclose(np.sum(g * d), fd, rtol=2e-2)


def test_assign_fpn_level():
    # A box of ~224px on a 1024 image maps to P4 (FPN eqn 1).
    s = 224.0 / 1024.0
    boxes = jnp.array([
        [0.0, 0.0, s, s],          # -> 4
        [0.0, 0.0, 4 * s, 4 * s],  # -> clamped 5 (log2(4)=2 above)
        [0.0, 0.0, s / 4, s / 4],  # -> 2
        [0.0, 0.0, 0.9, 0.9],      # big -> 5
        [0.0, 0.0, 0.01, 0.01],    # tiny -> clamp 2
    ])
    lvl = np.asarray(assign_fpn_level(boxes, (1024, 1024)))
    np.testing.assert_array_equal(lvl, [4, 5, 2, 5, 2])


def test_multilevel_matches_per_level(rng):
    b, c, n = 2, 8, 24
    feats = [jnp.array(rng.randn(b, s, s, c).astype(np.float32))
             for s in (32, 16, 8, 4)]
    y1x1 = rng.uniform(0, 0.6, (n, 2))
    boxes = np.concatenate([y1x1, y1x1 + rng.uniform(0.02, 0.4, (n, 2))],
                           1).astype(np.float32)
    box_ind = rng.randint(0, b, n).astype(np.int32)
    jb = jnp.array(boxes)
    lvl = np.asarray(assign_fpn_level(jb, (128, 128))) - 2
    got = np.asarray(multilevel_crop_and_resize(
        feats, jb, jnp.array(box_ind), (7, 7), (128, 128)))
    for k in range(n):
        want = np_crop_and_resize(np.asarray(feats[lvl[k]]),
                                  boxes[k:k + 1], box_ind[k:k + 1], 7)
        np.testing.assert_allclose(got[k], want[0], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("crop", [1, 7])
def test_pallas_matches_xla(rng, crop):
    b, h, w, c, nb = 2, 16, 16, 8, 8
    image = rng.randn(b, h, w, c).astype(np.float32)
    y1x1 = rng.uniform(-0.2, 0.9, (b, nb, 2))
    boxes = np.concatenate([y1x1, y1x1 + rng.uniform(0.05, 0.5, (b, nb, 2))],
                           -1).astype(np.float32)
    got = np.asarray(crop_and_resize_pallas(
        jnp.array(image), jnp.array(boxes), (crop, crop),
        box_tile=4, channel_tile=8, interpret=True))
    idx = np.repeat(np.arange(b), nb).astype(np.int32)
    want = np.asarray(crop_and_resize(
        jnp.array(image), jnp.array(boxes.reshape(-1, 4)), jnp.array(idx),
        (crop, crop))).reshape(b, nb, crop, crop, c)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_custom_vjp_backward(rng, monkeypatch):
    # interpret-mode Pallas inside the custom_vjp wrapper
    import feature_intertwiner_tpu.ops.roi_align as ra

    real_pallas = ra.crop_and_resize_pallas

    def _interp_pallas(image, boxes, crop_size, extrapolation_value=0.0):
        return real_pallas(image, boxes, crop_size, extrapolation_value,
                           box_tile=4, channel_tile=4, interpret=True)

    monkeypatch.setattr(ra, "crop_and_resize_pallas", _interp_pallas)

    b, h, w, c, nb = 1, 8, 8, 4, 4
    image = jnp.array(rng.randn(b, h, w, c).astype(np.float32))
    y1x1 = rng.uniform(0, 0.5, (b, nb, 2))
    boxes = jnp.array(np.concatenate(
        [y1x1, y1x1 + 0.3], -1).astype(np.float32))

    def loss_fused(img):
        return jnp.sum(ra.crop_and_resize_fused(img, boxes, (5, 5)) ** 2)

    def loss_ref(img):
        idx = jnp.zeros((nb,), jnp.int32)
        return jnp.sum(crop_and_resize(img, boxes.reshape(-1, 4), idx, (5, 5)) ** 2)

    g_fused = np.asarray(jax.grad(loss_fused)(image))
    g_ref = np.asarray(jax.grad(loss_ref)(image))
    np.testing.assert_allclose(g_fused, g_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("crop", [(28, 28), (1, 1), (5, 9)])
@pytest.mark.parametrize("channels", [1, 3])
def test_separable_matches_gather(rng, crop, channels):
    """The MXU (Wy @ img @ Wx^T) crop equals the 4-corner gather crop,
    including out-of-range boxes, inverted boxes, and degenerate points."""
    n, h, w = 32, 56, 40
    images = jnp.array(rng.randn(n, h, w, channels).astype(np.float32))
    boxes = np.concatenate(
        [
            rng.uniform(-0.4, 1.4, (n - 4, 4)),
            np.array([[0.0, 0.0, 1.0, 1.0],
                      [0.3, 0.3, 0.3, 0.3],       # degenerate point
                      [0.8, 0.8, 0.2, 0.2],       # inverted
                      [-1.0, -1.0, -0.5, -0.5]]),  # fully outside
        ]
    ).astype(np.float32)
    boxes = jnp.array(boxes)
    idx = jnp.arange(n, dtype=jnp.int32)

    ref = np.asarray(crop_and_resize(images, boxes, idx, crop))
    got = np.asarray(crop_and_resize_separable(images, boxes, crop))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_separable_extrapolation_value(rng):
    images = jnp.array(rng.randn(6, 16, 16, 1).astype(np.float32))
    boxes = jnp.array(rng.uniform(-0.6, 1.6, (6, 4)).astype(np.float32))
    idx = jnp.arange(6, dtype=jnp.int32)
    ref = np.asarray(crop_and_resize(images, boxes, idx, (7, 7),
                                     extrapolation_value=3.5))
    got = np.asarray(crop_and_resize_separable(images, boxes, (7, 7),
                                               extrapolation_value=3.5))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

"""Warm-graft make-up-layer initializers (VERDICT r2 #5).

Grafting a fresh Dev onto a converged DEV.SWITCH=False baseline re-routes
every small-RoI pooling through UpsampleBlock; with the reference's random
init that destroys the converged feature path at step 0 (measured
−0.04…−0.06 AP at small fine-tune budgets — README "Capability evidence").
These tests pin the mitigation contracts:

- init_mode='identity': conv is a delta kernel / deconv a bilinear-upsample
  kernel and BN starts at identity, so the block computes relu(x) (fac 1)
  resp. relu(bilinear2x(x)) (fac 2) at init;
- residual=True: zero-init gate makes the block the exact identity (fac 1)
  / exact bilinear 2x upsample (fac 2) at init, negatives included.

Reference: lib/sub_module.py:309-327 (the make-up layer),
tools/utils.py:271-313 (the pretrain->graft workflow this regime models).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.models.intertwiner import UpsampleBlock


def _apply(block, x):
    variables = block.init(jax.random.PRNGKey(0), x)
    return block.apply(variables, x, train_bn=False)


def test_identity_conv_is_relu_of_input():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.float32)
    out = _apply(UpsampleBlock(16, factor=1.0, init_mode="identity"), x)
    np.testing.assert_allclose(out, jax.nn.relu(x), rtol=0, atol=1e-4)


def test_identity_deconv_is_relu_of_bilinear_upsample():
    # constant input: any bilinear interpolation of a constant is the
    # constant itself, regardless of tap alignment
    x = jnp.full((1, 6, 6, 8), 3.5, jnp.float32)
    out = _apply(UpsampleBlock(8, factor=2.0, init_mode="identity"), x)
    assert out.shape == (1, 12, 12, 8)
    interior = out[:, 1:-2, 1:-2, :]
    np.testing.assert_allclose(interior, 3.5, rtol=0, atol=1e-4)
    # a linear ramp is reproduced with interpolated odd rows
    ramp = jnp.broadcast_to(
        jnp.arange(6, dtype=jnp.float32)[None, :, None, None], (1, 6, 6, 8))
    up = _apply(UpsampleBlock(8, factor=2.0, init_mode="identity"), ramp)
    diffs = np.diff(np.asarray(up[0, 1:-2, 3, 0]))
    np.testing.assert_allclose(diffs, 0.5, rtol=0, atol=1e-3)


@pytest.mark.parametrize("factor", [1.0, 2.0])
@pytest.mark.parametrize("init_mode", ["xavier", "identity"])
def test_residual_gate_is_exact_identity_at_init(factor, init_mode):
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 8), jnp.float32)
    block = UpsampleBlock(8, factor=factor, init_mode=init_mode,
                          residual=True)
    out = _apply(block, x)
    if factor == 1.0:
        base = x
    else:
        base = jax.image.resize(x, (1, 16, 16, 8), method="bilinear")
    # exact identity: negatives survive (no ReLU clipping on the base path)
    np.testing.assert_allclose(out, base, rtol=0, atol=1e-6)
    assert float(jnp.min(out)) < 0


def test_config_threads_upsample_init():
    from feature_intertwiner_tpu.config import build_config
    from feature_intertwiner_tpu.models import InterNet

    cfg = build_config()
    cfg.DEV.SWITCH = True
    cfg.DEV.UPSAMPLE_INIT = "identity"
    cfg.DEV.UPSAMPLE_RESIDUAL = True
    cfg.finalize()
    model = InterNet.from_config(cfg)
    assert model.dev_upsample_init == "identity"
    assert model.dev_upsample_residual is True


def test_bad_init_mode_raises():
    x = jnp.zeros((1, 4, 4, 4), jnp.float32)
    with pytest.raises(ValueError, match="UPSAMPLE_INIT"):
        UpsampleBlock(4, factor=1.0, init_mode="bogus").init(
            jax.random.PRNGKey(0), x)

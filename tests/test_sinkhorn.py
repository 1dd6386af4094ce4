"""Sinkhorn OT tests with a numpy oracle of OT_module.py:104-135."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feature_intertwiner_tpu.ops.sinkhorn import sinkhorn_divergence, sinkhorn_ot


def np_sinkhorn(x, y, eps=1.0, L=5, form="cosine"):
    n = x.shape[0]
    if form == "cosine":
        xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-20)
        yn = y / (np.linalg.norm(y, axis=1, keepdims=True) + 1e-20)
        c = 1 - xn @ yn.T
    else:
        c = np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)
    k = np.exp(-eps * c)
    b = np.full((n, 1), 1.0 / n)
    const = np.full((n, 1), 1.0 / n)
    for _ in range(L):
        a = const / (k @ b + 1e-20)
        b = const / (k.T @ a + 1e-20)
    p = a * k * b.T
    return float(np.sum(p * c))


@pytest.mark.parametrize("form", ["cosine", "l2"])
def test_sinkhorn_matches_oracle(rng, form):
    x = rng.randn(12, 32).astype(np.float32)
    y = rng.randn(12, 32).astype(np.float32)
    got = float(sinkhorn_ot(jnp.array(x), jnp.array(y), cost_form=form))
    want = np_sinkhorn(x, y, form=form)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_debiased_self_is_zero(rng):
    x = rng.randn(2, 10, 16).astype(np.float32)
    d = np.asarray(sinkhorn_divergence(jnp.array(x), jnp.array(x)))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_debiased_matches_components(rng):
    x = rng.randn(1, 8, 16).astype(np.float32)
    y = rng.randn(1, 8, 16).astype(np.float32)
    got = float(sinkhorn_divergence(jnp.array(x), jnp.array(y))[0])
    want = (2 * np_sinkhorn(x[0], y[0]) - np_sinkhorn(x[0], x[0])
            - np_sinkhorn(y[0], y[0]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradient_flows_through_cost_only(rng):
    # stop_grad_plan=True: gradient flows through C but not through P.
    x = jnp.array(rng.randn(6, 8).astype(np.float32))
    y = jnp.array(rng.randn(6, 8).astype(np.float32))
    g = jax.grad(lambda a: sinkhorn_ot(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

"""Entropic optimal transport (Sinkhorn) — the intertwiner's OT meta-loss.

Semantics parity with ``OptTrans._sinkhorn_iterate``
(``/root/reference/lib/OT_module.py:104-135``): cost is ``1 − cosine`` over
L2-normalized rows (or pairwise L2), kernel ``K = exp(−ε·C)``, uniform
marginals, a fixed number of ``a = 1/n ÷ Kb`` / ``b = 1/n ÷ Kᵀa`` updates
(reference L=5), transport plan ``P = a·K·bᵀ`` **detached** before the final
``⟨P, C⟩`` (``no_bp_P_L``), and the debiased divergence
``2·OT(x,y) − OT(x,x) − OT(y,y)`` (OT_module.py:78-80).

TPU-first shape: the reference loops ``for i in range(bs)`` over samples and
``for i in range(L)`` in Python; here the batch is a ``vmap`` and the Sinkhorn
updates a ``lax.scan`` — one fused compiled loop of [n,n] matmuls on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

EPS = 1e-20


def cost_matrix(x: jax.Array, y: jax.Array, form: str = "cosine") -> jax.Array:
    """Pairwise cost between rows of x [n, d] and y [m, d]."""
    if form == "cosine":
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + EPS)
        yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + EPS)
        return 1.0 - xn @ yn.T
    if form == "l2":
        d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
        return jnp.sqrt(jnp.maximum(d2, 0.0) + EPS)
    raise ValueError(f"unknown cost form {form!r}")


def sinkhorn_ot(
    x: jax.Array,
    y: jax.Array,
    epsilon: float = 1.0,
    iters: int = 5,
    cost_form: str = "cosine",
    stop_grad_plan: bool = True,
    weights: jax.Array = None,
) -> jax.Array:
    """⟨P, C⟩ after ``iters`` Sinkhorn updates. x [n,d], y [n,d] -> scalar.

    ``epsilon`` here multiplies the cost in the kernel (the reference stores
    ``1/epsilon`` and its default ``epsilon=1`` makes them identical).

    ``weights`` ([n], optional) generalizes the uniform 1/n marginals to
    masked marginals ``w_i = mask_i / n_selected`` — rows with weight 0 drop
    out of the plan exactly, so a fixed-shape padded call reproduces the
    reference's dynamic row selection (used by the class-level OT meta-loss
    under jit).
    """
    n = x.shape[0]
    c = cost_matrix(x, y, cost_form)
    k = jnp.exp(-epsilon * c)
    if weights is None:
        marg = jnp.full((n, 1), 1.0 / n, dtype=x.dtype)
    else:
        marg = weights.reshape(n, 1).astype(x.dtype)

    def step(carry, _):
        _, b = carry
        a = marg / (k @ b + EPS)
        b_new = marg / (k.T @ a + EPS)
        return (a, b_new), None

    # the plan pairs the LAST in-loop a (computed from b_{L-1}) with the
    # final b — exactly the reference's loop exit state (OT_module.py:121-130);
    # recomputing a from the final b would add half an iteration
    (a, b), _ = lax.scan(step, (marg, marg), None, length=iters)
    plan = a * k * b.T
    if stop_grad_plan:
        plan = lax.stop_gradient(plan)
    return jnp.sum(plan * c)


@functools.partial(
    jax.jit,
    static_argnames=("epsilon", "iters", "cost_form", "stop_grad_plan", "debiased"),
)
def sinkhorn_divergence(
    x: jax.Array,
    y: jax.Array,
    epsilon: float = 1.0,
    iters: int = 5,
    cost_form: str = "cosine",
    stop_grad_plan: bool = True,
    debiased: bool = True,
    weights: jax.Array = None,
) -> jax.Array:
    """Batched (de)biased OT loss. x, y: [B, n, d] -> [B].

    ``debiased=True`` is the reference default (``remove_bias=False`` computes
    the debiased form; the flag naming in the reference is inverted).
    ``weights`` [B, n] optionally masks rows (see sinkhorn_ot).
    """
    if weights is None:
        ot = jax.vmap(
            lambda a, b: sinkhorn_ot(a, b, epsilon, iters, cost_form,
                                     stop_grad_plan)
        )
        ot_xy, ot_xx, ot_yy = ot(x, y), ot(x, x), ot(y, y)
    else:
        ot = jax.vmap(
            lambda a, b, w: sinkhorn_ot(a, b, epsilon, iters, cost_form,
                                        stop_grad_plan, weights=w)
        )
        ot_xy, ot_xx, ot_yy = ot(x, y, weights), ot(x, x, weights), ot(y, y, weights)
    if not debiased:
        return ot_xy
    return 2.0 * ot_xy - ot_xx - ot_yy

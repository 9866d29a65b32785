"""Observability: duality gap, KKT residuals, convergence metrics.

The reference tracks convergence only via the max per-epoch coordinate
displacement ``maxH`` (coordinate_descent.jl:83-89) and has no logging
(SURVEY.md §5.5).  The north-star metric for this framework is
time-to-1e-7 **duality gap**, which the reference does not compute — so we
add an explicit Fenchel duality gap for the (weighted) Lasso objective
``P(β) = ‖y − Xβ‖²/(2n) + λ0 Σ_j ω_j |β_j|``.
"""

from __future__ import annotations

import jax.numpy as jnp


def lasso_duality_gap(X, y, beta, lam0, weights=None):
    """Fenchel duality gap for the (weighted) Lasso.

    Dual of ``min ‖y − Xβ‖²/(2n) + λ0 Σ ω_j|β_j|`` over scaled residuals:
    ``D(θ) = (‖y‖² − ‖y − θ‖²)/(2n)`` subject to ``|X_j'θ|/n ≤ λ0 ω_j``.
    We take θ as the residual rescaled into the dual-feasible set,
    the standard gap certificate.  Returns a scalar ≥ 0 (up to rounding).
    """
    n = y.shape[0]
    r = y - X @ beta
    g = X.T @ r
    if weights is None:
        weights = jnp.ones_like(beta)
    # largest |X_j'r| relative to its allowed level n·λ0·ω_j
    ratio = jnp.max(jnp.abs(g) / (n * lam0 * weights))
    scale = jnp.minimum(1.0, 1.0 / jnp.maximum(ratio, 1e-30))
    theta = r * scale
    primal = jnp.sum(r * r) / (2 * n) + lam0 * jnp.sum(
        weights * jnp.abs(beta))
    dual = (jnp.sum(y * y) - jnp.sum((y - theta) ** 2)) / (2 * n)
    return primal - dual


def lasso_kkt_residual(X, y, beta, lam0, weights=None):
    """Max KKT violation ``max_j (|X_j'(y−Xβ)|/n − λ0 ω_j)_+`` plus the
    on-support stationarity error — the quantity the reference's tests bound
    (test/lasso.jl:54, 97-98)."""
    n = y.shape[0]
    r = y - X @ beta
    g = (X.T @ r) / n
    if weights is None:
        weights = jnp.ones_like(beta)
    lam = lam0 * weights
    off = jnp.maximum(jnp.abs(g) - lam, 0.0)
    on = jnp.where(beta != 0, jnp.abs(g - lam * jnp.sign(beta)), 0.0)
    return jnp.maximum(jnp.max(off), jnp.max(on))

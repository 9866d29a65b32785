"""Numeric helper tests vs NumPy formulas (reference src/utils.jl:60-175)."""

import numpy as np

import jax.numpy as jnp

from coordinatedescent_jl_tpu import (
    find_init_residuals,
    find_init_sigma,
    find_largest_correlations,
    get_loadings,
    get_sigma,
    sample_std,
    std_X,
)

RNG = np.random.default_rng(3)


def test_std_X_plain_and_weighted():
    n, p = 50, 8
    X = RNG.standard_normal((n, p))
    w = RNG.uniform(0.1, 2.0, size=n)
    np.testing.assert_allclose(np.asarray(std_X(jnp.asarray(X))),
                               np.sqrt((X**2).mean(axis=0)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(std_X(jnp.asarray(X), jnp.asarray(w))),
        np.sqrt((w[:, None] * X**2).sum(axis=0) / n), rtol=1e-12)


def test_get_loadings_and_sigma():
    n, p = 40, 6
    X = RNG.standard_normal((n, p))
    e = RNG.standard_normal(n)
    w = RNG.uniform(0.1, 1.0, size=n)
    np.testing.assert_allclose(
        np.asarray(get_loadings(jnp.asarray(X), jnp.asarray(e))),
        np.sqrt(((X * e[:, None]) ** 2).mean(axis=0)), rtol=1e-12)
    np.testing.assert_allclose(
        float(get_sigma(jnp.asarray(w), jnp.asarray(e))),
        np.sqrt((e**2 * w).sum() / w.sum()), rtol=1e-12)
    np.testing.assert_allclose(float(sample_std(jnp.asarray(e))),
                               e.std(ddof=1), rtol=1e-12)


def test_screening_and_init_residuals():
    n, p, s = 100, 20, 5
    X = RNG.standard_normal((n, p))
    y = X[:, :3] @ np.array([5.0, 4.0, 3.0]) + 0.1 * RNG.standard_normal(n)
    idx = np.asarray(find_largest_correlations(jnp.asarray(X),
                                               jnp.asarray(y), s))
    ref_order = np.argsort(-np.abs(X.T @ y))[:s]
    assert set(idx.tolist()) == set(ref_order.tolist())
    r = np.asarray(find_init_residuals(jnp.asarray(X), jnp.asarray(y), s))
    Xs = X[:, sorted(idx.tolist())]
    ref_r = y - Xs @ np.linalg.lstsq(Xs, y, rcond=None)[0]
    np.testing.assert_allclose(r, ref_r, atol=1e-8)
    sig = float(find_init_sigma(jnp.asarray(X), jnp.asarray(y), s))
    np.testing.assert_allclose(sig, ref_r.std(ddof=1), rtol=1e-8)


def test_weighted_init_residuals():
    n, p, s = 80, 15, 4
    X = RNG.standard_normal((n, p))
    y = X[:, :2] @ np.array([4.0, 3.0]) + 0.1 * RNG.standard_normal(n)
    w = RNG.uniform(0.1, 2.0, size=n)
    r = np.asarray(find_init_residuals(jnp.asarray(X), jnp.asarray(y), s,
                                       jnp.asarray(w)))
    idx = np.argsort(-np.abs(X.T @ (w * y)))[:s]
    Xs = X[:, sorted(idx.tolist())]
    W = np.diag(w)
    coef = np.linalg.solve(Xs.T @ W @ Xs, Xs.T @ W @ y)
    np.testing.assert_allclose(r, y - Xs @ coef, atol=1e-8)

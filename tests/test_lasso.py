"""Estimator API tests — ports of reference test/lasso.jl patterns."""

import numpy as np
import pytest

import jax.numpy as jnp

from coordinatedescent_jl_tpu import (
    CDOptions,
    IterLassoOptions,
    ProxL1,
    feasible_lasso,
    lasso,
    lasso_path,
    refit_lasso_path,
    scaled_lasso,
    sqrt_lasso,
)
from oracle import cd_lasso

RNG = np.random.default_rng(2)
OPTS = CDOptions(opt_tol=1e-12, block_size=16)


def test_lasso_zero_above_lambda_max():
    # λ > λmax ⇒ β = 0 (reference test/lasso.jl:23-34)
    n, p = 100, 10
    X = RNG.standard_normal((n, p))
    y = X @ np.ones(p) + 0.1 * RNG.standard_normal(n)
    lam = np.abs(X.T @ y / n).max() + 0.1
    out = lasso(X, y, lam, options=OPTS)
    assert np.all(np.asarray(out.x) == 0)
    np.testing.assert_allclose(np.asarray(out.residuals), y, atol=1e-12)


def test_lasso_weighted_kkt():
    # weighted lasso KKT (reference test/lasso.jl:37-55)
    n, p, s = 100, 10, 5
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ np.ones(s) + 0.1 * RNG.standard_normal(n)
    lamw = np.full(p, 0.3)
    out = lasso(X, y, 1.0, weights=lamw, options=OPTS)
    ref, _ = cd_lasso(X, y, 1.0, lamw=lamw)
    np.testing.assert_allclose(np.asarray(out.x), ref, atol=1e-5)
    kkt = np.abs(X.T @ (y - X @ np.asarray(out.x)) / n).max()
    assert abs(kkt - 0.3) / 0.3 < 1e-5
    # σ is the sample std of residuals (lasso.jl:37)
    r = np.asarray(out.residuals)
    np.testing.assert_allclose(float(out.sigma), r.std(ddof=1), rtol=1e-10)


def test_lasso_interfaces_agree():
    # plain vs explicit unit weights (reference test/lasso.jl:57-73)
    n, p, s = 200, 80, 20
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + RNG.standard_normal(n)
    x1 = lasso(X, y, 0.1, options=OPTS)
    x2 = lasso(X, y, 0.1, weights=np.ones(p), options=OPTS)
    np.testing.assert_allclose(np.asarray(x1.x), np.asarray(x2.x), atol=1e-5)


def test_sqrt_lasso_kkt():
    # (reference test/lasso.jl:103-133)
    n, p, s = 100, 50, 5
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + RNG.standard_normal(n)
    lam = 2.8 / np.sqrt(n)
    out = sqrt_lasso(X, y, lam, standardize_X=False, options=OPTS)
    r = np.asarray(out.residuals)
    kkt = np.abs(X.T @ r).max() / np.linalg.norm(r)
    assert kkt <= lam * (1 + 1e-5)
    # support coordinates achieve equality
    beta = np.asarray(out.x)
    for j in np.nonzero(beta)[0]:
        assert abs(abs(X[:, j] @ r) / np.linalg.norm(r) - lam) < 1e-5


def test_scaled_lasso_inits_agree():
    # both init procedures reach the same (β, σ) fixed point and satisfy
    # the scaled-lasso KKT max|X'r/n| ≤ λσ̂ (reference test/lasso.jl:181-213)
    n, p, s = 300, 100, 10
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ (2 * np.ones(s)) + RNG.standard_normal(n)
    lam = np.sqrt(2 * np.log(p) / n)
    opts1 = IterLassoOptions(options_cd=OPTS, init_procedure="screening",
                             s_init=10, opt_tol=1e-6)
    opts2 = IterLassoOptions(options_cd=OPTS, init_procedure="init_std",
                             sigma_init=1.0, opt_tol=1e-6)
    sol1 = scaled_lasso(X, y, lam, options=opts1)
    sol2 = scaled_lasso(X, y, lam, options=opts2)
    np.testing.assert_allclose(np.asarray(sol1.x), np.asarray(sol2.x),
                               atol=1e-4)
    r = np.asarray(sol1.residuals)
    sig_hat = np.sqrt(np.sum(r**2) / n)
    kkt = np.abs(X.T @ r / n).max()
    assert kkt <= lam * sig_hat * (1 + 1e-3)


def test_scaled_lasso_matches_manual_outer_loop():
    # the jitted outer loop ≡ a hand-written host loop over lasso solves
    n, p, s = 150, 40, 5
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ np.ones(s) + RNG.standard_normal(n)
    lam = np.sqrt(2 * np.log(p) / n)
    sol = scaled_lasso(
        X, y, lam,
        options=IterLassoOptions(options_cd=OPTS,
                                 init_procedure="init_std", sigma_init=1.0))
    # manual loop
    sig = 1.0
    beta = np.zeros(p)
    for _ in range(20):
        beta, r = cd_lasso(X, y, lam * sig)
        signew = np.sqrt(np.sum(r**2) / n)
        if abs(signew - sig) / sig < 1e-2:
            break
        sig = signew
    np.testing.assert_allclose(np.asarray(sol.x), beta, atol=1e-4)


def test_feasible_lasso_runs_and_kkt():
    # feasibleLasso! is broken/untested in the reference (SURVEY.md §7);
    # verify the intended semantics: weighted-KKT with the final loadings.
    n, p, s = 200, 50, 5
    X = RNG.standard_normal((n, p))
    eps = RNG.standard_normal(n) * (1 + 0.5 * np.abs(X[:, 0]))
    y = X[:, :s] @ np.ones(s) + eps
    lam = 1.1 * np.sqrt(2 * np.log(p) / n)
    sol = feasible_lasso(X, y, lam,
                         options=IterLassoOptions(options_cd=OPTS))
    r = np.asarray(sol.residuals)
    gam = np.asarray(sol.penalty.weights)
    kkt = np.abs(X.T @ r / n) / gam
    assert kkt.max() <= lam * (1 + 1e-3)
    # loadings are a fixed point: Γ ≈ sqrt(mean((X ε̂)²))
    gam_check = np.sqrt(np.mean((X * r[:, None]) ** 2, axis=0))
    assert np.max(np.abs(gam - gam_check)) / gam_check.max() < 1e-2


def test_lasso_path_matches_individual_solves():
    # path points ≡ individual lasso solves, both standardize modes
    # (reference test/lasso.jl:220-288)
    n, p, s = 150, 40, 8
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + 0.5 * RNG.standard_normal(n)
    lam_max = np.abs(X.T @ y / n).max()
    lam_path = lam_max * np.logspace(0, -2, 20)
    for standardize in (True, False):
        path = lasso_path(X, y, lam_path, options=OPTS,
                          standardize_X=standardize)
        assert path.beta_path.shape == (20, p)
        lamw = (np.sqrt((X**2).mean(axis=0)) if standardize
                else np.ones(p))
        for i in [0, 7, 19]:
            ref, _ = cd_lasso(X, y, lam_path[i], lamw=lamw)
            np.testing.assert_allclose(np.asarray(path.beta_path[i]), ref,
                                       atol=1e-5)


def test_lasso_path_early_stop_and_refit():
    n, p, s = 100, 30, 10
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + 0.1 * RNG.standard_normal(n)
    lam_max = np.abs(X.T @ y / n).max()
    lam_path = lam_max * np.logspace(0, -3, 30)
    path = lasso_path(X, y, lam_path, options=OPTS, max_hat_s=6,
                      standardize_X=False)
    # truncated: all but the last valid point have support ≤ 6
    nnz = (np.asarray(path.beta_path) != 0).sum(axis=1)
    assert len(path.lam_path) < 30
    assert np.all(nnz[:-1] <= 6)
    assert nnz[-1] > 6  # the exceeding point is kept (lasso.jl:253-256)
    # refit: per distinct support OLS == lstsq (reference test/lasso.jl:270+)
    out = refit_lasso_path(path, X, y)
    for S, coef in out.items():
        if len(S) == 0:
            continue
        ref = np.linalg.lstsq(X[:, list(S)], y, rcond=None)[0]
        np.testing.assert_allclose(coef, ref, atol=1e-8)


def test_lasso_path_scan_chunked_bitwise():
    # host-chunked scan execution ≡ the monolithic scan, bitwise: the
    # full solver carry (state + ws cache + secant abscissae + stop flag)
    # round-trips between segment programs unchanged.  Covers chunk sizes
    # that split mid-grid, chunk=1 (one program per point), and a chunk
    # larger than the grid (must take the monolithic branch).
    n, p, s = 150, 60, 10
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + 0.3 * RNG.standard_normal(n)
    lam_max = np.abs(X.T @ y / n).max()
    lam_path = lam_max * np.logspace(-0.2, -2, 17)
    for opts in (OPTS,
                 CDOptions(opt_tol=1e-12, block_size=16, randomize=True),
                 CDOptions(opt_tol=1e-12, block_size=16,
                           compact=True, compact_size=32)):
        ref = lasso_path(X, y, lam_path, options=opts, path_batch=0)
        for ch in (1, 5, 17, 40):
            chunked = lasso_path(X, y, lam_path, options=opts,
                                 path_batch=0, scan_chunk=ch)
            assert chunked.beta_path.shape == ref.beta_path.shape
            assert bool(jnp.all(chunked.beta_path == ref.beta_path)), \
                f"chunk={ch} diverged from the monolithic scan"


def test_lasso_path_scan_chunked_early_stop():
    # max_hat_s truncation identical under chunking (the chunked driver
    # stops issuing segments once the carry's stop flag is set)
    n, p, s = 100, 30, 10
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + 0.1 * RNG.standard_normal(n)
    lam_max = np.abs(X.T @ y / n).max()
    lam_path = lam_max * np.logspace(0, -3, 30)
    ref = lasso_path(X, y, lam_path, options=OPTS, max_hat_s=6,
                     standardize_X=False, path_batch=0)
    for ch in (4, 11):
        chunked = lasso_path(X, y, lam_path, options=OPTS, max_hat_s=6,
                             standardize_X=False, path_batch=0,
                             scan_chunk=ch)
        assert chunked.beta_path.shape == ref.beta_path.shape
        assert bool(jnp.all(chunked.beta_path == ref.beta_path))
    with pytest.raises(ValueError):
        lasso_path(X, y, lam_path, options=OPTS, scan_chunk=0)

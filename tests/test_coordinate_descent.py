"""Core CD driver tests — ports of reference test/coordinate_descent.jl
patterns (SURVEY.md §4): closed-form micro-case, config invariance,
cross-formulation equivalence, ProxZero."""

import numpy as np
import pytest

import jax.numpy as jnp

from coordinatedescent_jl_tpu import (
    CDOptions,
    LeastSquaresLoss,
    ProxL1,
    ProxZero,
    QuadraticLoss,
    SqrtLassoLoss,
    WeightedLSLoss,
    coordinate_descent,
)
from oracle import cd_lasso, cd_quadratic, cd_sqrt_lasso

RNG = np.random.default_rng(1)


def _opts(**kw):
    base = dict(opt_tol=1e-12, block_size=16)
    base.update(kw)
    return CDOptions(**base)


def test_closed_form_identity_design():
    # 2-D identity design: analytic solution (0, 0.3)
    # (reference test/coordinate_descent.jl:13-25)
    X = np.eye(2)
    y = np.array([0.1, 0.8])
    lam = 0.25  # threshold per coordinate: soft(y_i, n*lam/1) with n=2
    beta, r = coordinate_descent(
        jnp.zeros(2), LeastSquaresLoss(jnp.asarray(y), jnp.asarray(X)),
        ProxL1(lam), _opts())
    # per-coordinate: soft(y_i, 2*0.25/1) = soft(y_i, 0.5)
    np.testing.assert_allclose(np.asarray(beta), [0.0, 0.3], atol=1e-10)
    np.testing.assert_allclose(np.asarray(r), y - np.asarray(beta),
                               atol=1e-10)


@pytest.mark.parametrize("warm_start", [True, False])
@pytest.mark.parametrize("randomize", [True, False])
def test_config_invariance_ls(warm_start, randomize):
    # All warmStart×randomize combos converge to the same solution
    # (reference test/coordinate_descent.jl:44-61)
    n, p, s = 120, 30, 6
    X = RNG.standard_normal((n, p))
    beta_true = np.zeros(p)
    beta_true[:s] = RNG.standard_normal(s)
    y = X @ beta_true + 0.1 * RNG.standard_normal(n)
    lam = 0.1
    ref, _ = cd_lasso(X, y, lam)
    beta, _ = coordinate_descent(
        jnp.zeros(p), LeastSquaresLoss(jnp.asarray(y), jnp.asarray(X)),
        ProxL1(lam), _opts(warm_start=warm_start, randomize=randomize),
        seed=3)
    np.testing.assert_allclose(np.asarray(beta), ref, atol=1e-5)


def test_quadratic_vs_least_squares():
    # Gram ("covariance") form ≡ residual form
    # (reference test/lasso.jl:87-96)
    n, p, s = 200, 50, 10
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + 0.1 * RNG.standard_normal(n)
    lam = 0.2
    f_quad = QuadraticLoss(jnp.asarray(X.T @ X / n), jnp.asarray(-X.T @ y / n))
    f_ls = LeastSquaresLoss(jnp.asarray(y), jnp.asarray(X))
    b1, _ = coordinate_descent(jnp.zeros(p), f_quad, ProxL1(lam), _opts())
    b2, _ = coordinate_descent(jnp.zeros(p), f_ls, ProxL1(lam), _opts())
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
    # KKT: (max|X'(y−Xβ)/n| − λ)/λ ≈ 0 (reference test/lasso.jl:97-98)
    g = np.abs(X.T @ (y - X @ np.asarray(b2)) / n).max()
    assert abs(g - lam) / lam < 1e-5


def test_quadratic_matches_oracle():
    p = 20
    M = RNG.standard_normal((p, p))
    A = M.T @ M / p + 0.5 * np.eye(p)
    q = RNG.standard_normal(p)
    lam = 0.15
    ref, _ = cd_quadratic(A, q, lam)
    beta, _ = coordinate_descent(
        jnp.zeros(p), QuadraticLoss(jnp.asarray(A), jnp.asarray(q)),
        ProxL1(lam), _opts())
    np.testing.assert_allclose(np.asarray(beta), ref, atol=1e-7)


def test_weighted_ls_matches_oracle():
    n, p = 100, 25
    X = RNG.standard_normal((n, p))
    y = X[:, :5] @ RNG.standard_normal(5) + 0.1 * RNG.standard_normal(n)
    w = RNG.uniform(0.5, 2.0, size=n)
    lamw = RNG.uniform(0.5, 1.5, size=p)
    lam = 0.1
    ref, ref_r = cd_lasso(X, y, lam, lamw=lamw, w=w)
    beta, r = coordinate_descent(
        jnp.zeros(p),
        WeightedLSLoss(jnp.asarray(y), jnp.asarray(X), jnp.asarray(w)),
        ProxL1(lam, jnp.asarray(lamw)), _opts())
    np.testing.assert_allclose(np.asarray(beta), ref, atol=1e-7)
    np.testing.assert_allclose(np.asarray(r), ref_r, atol=1e-7)


def test_sqrt_lasso_matches_oracle():
    n, p, s = 100, 30, 5
    X = RNG.standard_normal((n, p))
    y = X[:, :s] @ RNG.standard_normal(s) + RNG.standard_normal(n)
    lam = 0.3
    ref, _ = cd_sqrt_lasso(X, y, lam)
    beta, r = coordinate_descent(
        jnp.zeros(p), SqrtLassoLoss(jnp.asarray(y), jnp.asarray(X)),
        ProxL1(lam), _opts())
    np.testing.assert_allclose(np.asarray(beta), ref, atol=1e-6)
    # sqrt-lasso KKT: max|X'r|/‖r‖ ≤ λ (reference test/lasso.jl:123)
    rn = np.asarray(r)
    kkt = np.abs(X.T @ rn).max() / np.linalg.norm(rn)
    assert kkt <= lam * (1 + 1e-5)


def test_prox_zero_gives_ols():
    # ProxZero → unpenalized smooth minimization
    # (reference src/coordinate_descent.jl:41-60)
    n, p = 80, 10
    X = RNG.standard_normal((n, p))
    y = X @ RNG.standard_normal(p) + 0.1 * RNG.standard_normal(n)
    beta, _ = coordinate_descent(
        jnp.zeros(p), LeastSquaresLoss(jnp.asarray(y), jnp.asarray(X)),
        ProxZero(), _opts(max_iter=5000))
    ols = np.linalg.lstsq(X, y, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(beta), ols, atol=1e-6)


def test_warm_start_from_random_point():
    # warm starts from different sparse starting points reach the same
    # solution (reference test/coordinate_descent.jl:80-97)
    n, p = 100, 20
    X = RNG.standard_normal((n, p))
    y = X[:, :4] @ RNG.standard_normal(4) + 0.1 * RNG.standard_normal(n)
    lam = 0.15
    ref, _ = cd_lasso(X, y, lam)
    beta0 = np.zeros(p)
    beta0[RNG.choice(p, 5, replace=False)] = RNG.standard_normal(5)
    beta, _ = coordinate_descent(
        jnp.asarray(beta0),
        LeastSquaresLoss(jnp.asarray(y), jnp.asarray(X)),
        ProxL1(lam), _opts(warm_start=True))
    np.testing.assert_allclose(np.asarray(beta), ref, atol=1e-5)


def test_f32_rounding_floor_converges_without_stall():
    """f32 with the reference-default opt_tol=1e-7 (one ulp below the f32
    step floor at |beta| ~ 1): conv_tol's rounding-floor detects the limit
    cycle in O(1) epochs instead of burning stall_patience full-check /
    active-solve rounds (block_cd.conv_tol); the solution still matches
    the f64 sequential oracle."""
    import jax
    from coordinatedescent_jl_tpu.ops.block_cd import (
        _to_blocked_beta, _unblock, build_blocked, solve_blocked)

    rng = np.random.default_rng(5)
    n, p, s = 300, 600, 10
    X = rng.standard_normal((n, p)).astype(np.float32)
    y = (X[:, :s] @ rng.standard_normal(s)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    lam = 0.2 * float(np.abs(X.T @ y / n).max())
    opts = CDOptions(opt_tol=1e-7, randomize=False)
    lamw = jnp.ones((p,), jnp.float32)
    prob = build_blocked("ls", opts, lamw, X=jnp.asarray(X),
                         y=jnp.asarray(y))
    st = solve_blocked(
        "ls", opts, prob, lam,
        _to_blocked_beta(jnp.zeros(p, jnp.float32), opts.block_size),
        jax.random.PRNGKey(0))
    assert bool(st.done)
    # measured 9 epochs; anything under stall_patience proves the floor
    # (not the stall detector) ended the solve
    assert int(st.it) < opts.stall_patience

    ref, _ = cd_lasso(X.astype(np.float64), y.astype(np.float64), lam,
                      tol=1e-11)
    got = np.asarray(_unblock(st.beta, p))
    assert set(np.nonzero(got)[0]) == set(np.nonzero(ref)[0])
    np.testing.assert_allclose(got, ref, atol=1e-6)

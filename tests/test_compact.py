"""Working-set compaction tests.

Compaction (CDOptions.compact) gathers the support + top KKT violations
into a dense ``(n, C)`` subproblem.  It changes the trajectory but not the
solution: every converged solve is still certified by the engine's full KKT
sweep (the reference's convergence contract, coordinate_descent.jl:72-90).
These tests pin:

- solution equivalence to the dense engine across losses / weights / paths,
- the support-overflow fallback (support > C still converges, via the
  ordinary dense active pass),
- the static auto-gating rule (off for f64, off when the working set
  wouldn't be meaningfully smaller than the problem).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import coordinatedescent_jl_tpu as cd
from coordinatedescent_jl_tpu.ops.block_cd import _compact_mode, build_blocked


def _gen(n, p, s, seed=0, noise=0.3, scatter=True):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    sup = (rng.choice(p, s, replace=False) if scatter else np.arange(s))
    beta[sup] = rng.standard_normal(s) + np.sign(rng.standard_normal(s))
    y = X @ beta + noise * rng.standard_normal(n)
    return jnp.asarray(X), jnp.asarray(y), sup


BASE = cd.CDOptions(block_size=16, compact_size=64, randomize=False)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("weighted", [False, True])
def test_compact_matches_dense_lasso(seed, weighted):
    X, y, _ = _gen(200, 512, 8, seed=seed)
    w = None
    if weighted:
        rng = np.random.default_rng(seed + 10)
        w = jnp.asarray(0.5 + np.abs(rng.standard_normal(512)))
    s_on = cd.lasso(X, y, 0.1, weights=w,
                    options=BASE.replace(compact=True))
    s_off = cd.lasso(X, y, 0.1, weights=w,
                     options=BASE.replace(compact=False))
    np.testing.assert_allclose(s_on.x, s_off.x, atol=5e-6)
    # both sit at the same certified optimum
    assert float(cd.lasso_duality_gap(X, y, s_on.x, 0.1, weights=w)) < 1e-6


def test_compact_matches_dense_path():
    X, y, _ = _gen(150, 400, 6, seed=3)
    lams = np.exp(np.linspace(np.log(0.5), np.log(0.03), 8))
    p_on = cd.lasso_path(X, y, lams, options=BASE.replace(compact=True),
                         standardize_X=True)
    p_off = cd.lasso_path(X, y, lams, options=BASE.replace(compact=False),
                          standardize_X=True)
    np.testing.assert_allclose(p_on.beta_path, p_off.beta_path, atol=5e-6)


def test_compact_matches_dense_sqrt():
    # noise-dominated regime: ‖r*‖ stays O(√n), so the sqrt-lasso optimum
    # is well-posed (p > n with strong signal interpolates, making KKT
    # degenerate as ‖r‖ → 0 — any comparison there is meaningless)
    # the engine's sqrt-lasso normalization thresholds |X_j'r| at λ·‖r‖
    # (cd_differentiable_function.jl:277-283), so the universal level is
    # √(2·log p) — NOT the √(2·log p / n) of the (1/n)-scaled Lasso
    X, y, _ = _gen(300, 512, 6, seed=4, noise=1.0)
    lam = 1.1 * float(np.sqrt(2 * np.log(512)))
    s_on = cd.sqrt_lasso(X, y, lam, options=BASE.replace(compact=True))
    s_off = cd.sqrt_lasso(X, y, lam, options=BASE.replace(compact=False))
    assert 0 < int(jnp.sum(s_on.x != 0)) < 48   # compaction engaged
    np.testing.assert_allclose(s_on.x, s_off.x, atol=5e-6)


def test_compact_cold_start_continuation():
    X, y, _ = _gen(120, 320, 5, seed=5)
    base = BASE.replace(warm_start=False, num_steps=20)
    s_on = cd.lasso(X, y, 0.08, options=base.replace(compact=True))
    s_off = cd.lasso(X, y, 0.08, options=base.replace(compact=False))
    np.testing.assert_allclose(s_on.x, s_off.x, atol=5e-6)


def test_compact_support_overflow_falls_back():
    """Support larger than the working set must still converge exactly
    (the pass detects nnz > C and falls back to the dense engine)."""
    X, y, _ = _gen(300, 256, 40, seed=6, noise=0.05)
    small = cd.CDOptions(block_size=16, compact_size=16, randomize=False)
    s_on = cd.lasso(X, y, 0.01, options=small.replace(compact=True))
    s_off = cd.lasso(X, y, 0.01, options=small.replace(compact=False))
    assert int(jnp.sum(s_on.x != 0)) > 16
    np.testing.assert_allclose(s_on.x, s_off.x, atol=5e-6)


def test_compact_auto_gating():
    opts = cd.CDOptions(block_size=16, compact_size=64)
    X32 = jnp.ones((8, 2048), jnp.float32)
    y32 = jnp.ones((8,), jnp.float32)
    prob32 = build_blocked("ls", opts, jnp.ones((2048,), jnp.float32),
                           X=X32, y=y32)
    # auto: on for f32 when nb >= 4*nc...
    assert _compact_mode("ls", opts, prob32, jnp.float32) == 4
    # ...off for f64 (exact reference trajectories preserved)
    assert _compact_mode("ls", opts, prob32, jnp.float64) == 0
    # forced on works for any dtype
    assert _compact_mode("ls", opts.replace(compact=True), prob32,
                         jnp.float64) == 4
    # off when the working set is not smaller than the problem
    Xs = jnp.ones((8, 64), jnp.float32)
    probs = build_blocked("ls", opts, jnp.ones((64,), jnp.float32),
                          X=Xs, y=y32)
    assert _compact_mode("ls", opts.replace(compact=True), probs,
                         jnp.float32) == 0
    # quad never compacts
    assert _compact_mode("quad", opts.replace(compact=True), prob32,
                         jnp.float32) == 0


def test_compact_f32_scattered_support():
    """The motivating regime: f32, scattered support, auto-enabled."""
    X, y, sup = _gen(200, 4096, 10, seed=7, noise=0.1)
    X = jnp.asarray(np.asarray(X), jnp.float32)
    y = jnp.asarray(np.asarray(y), jnp.float32)
    opts = cd.CDOptions(block_size=128, compact_size=512, opt_tol=1e-6)
    prob = build_blocked("ls", opts, jnp.ones((4096,), jnp.float32),
                         X=X, y=y)
    assert _compact_mode("ls", opts, prob, jnp.float32) == 4  # auto-on
    sol = cd.lasso(X, y, 0.05, options=opts)
    sol_dense = cd.lasso(X, y, 0.05, options=opts.replace(compact=False))
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(sol_dense.x),
                               atol=5e-4)
    got = set(np.nonzero(np.asarray(sol.x))[0])
    dense_sup = set(np.nonzero(np.asarray(sol_dense.x))[0])
    assert got == dense_sup


def test_path_extrapolated_warm_start_matches_oracle():
    """Secant extrapolation along the path (compaction forced so the
    cached-column shift path runs at f64): every point still matches the
    sequential-CD oracle — the extrapolated start is an accelerant, never
    a semantics change."""
    rng = np.random.default_rng(31)
    n, p, s = 150, 256, 8
    X = rng.standard_normal((n, p))
    y = X[:, :s] @ rng.standard_normal(s) + 0.5 * rng.standard_normal(n)
    lam_max = np.abs(X.T @ y / n).max()
    lam_path = lam_max * np.logspace(-0.3, -2, 12)
    opts = cd.CDOptions(block_size=8, compact=True, compact_size=64, extrapolate=True,
                        opt_tol=1e-9, randomize=False)
    path = cd.lasso_path(X, y, lam_path, options=opts, standardize_X=False)
    from oracle import cd_lasso
    for i in [0, 1, 2, 6, 11]:
        ref, _ = cd_lasso(X, y, lam_path[i], tol=1e-11)
        np.testing.assert_allclose(np.asarray(path.beta_path[i]), ref,
                                   atol=1e-6)


def test_continuation_extrapolated_start_matches_oracle():
    """Cold-start λ-continuation (solve_blocked warm_start=False) with the
    secant-extrapolated start and compaction forced: the final solution at
    the target λ still matches the sequential-CD oracle, for both the ls
    and sqrt kinds (the sqrt path additionally exercises the
    rsqr-refresh-on-full-check guarantee after an extrapolated shift)."""
    from oracle import cd_lasso, cd_sqrt_lasso
    rng = np.random.default_rng(17)
    n, p, s = 120, 200, 6
    X = rng.standard_normal((n, p))
    y = X[:, :s] @ rng.standard_normal(s) + 0.4 * rng.standard_normal(n)
    opts = cd.CDOptions(block_size=8, compact=True, compact_size=64, extrapolate=True,
                        opt_tol=1e-10, randomize=False, warm_start=False,
                        num_steps=25)

    lam = 0.1 * float(np.abs(X.T @ y / n).max())
    sol = cd.lasso(X, y, lam, options=opts)
    ref, _ = cd_lasso(X, y, lam, tol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.x), ref, atol=1e-7)

    lam_sq = 0.4 * float(np.abs(X.T @ (y / np.linalg.norm(y))).max())
    sol_sq = cd.sqrt_lasso(X, y, lam_sq, options=opts, standardize_X=False)
    ref_sq, _ = cd_sqrt_lasso(X, y, lam_sq, tol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_sq.x), ref_sq, atol=1e-7)


def test_scaled_lasso_compact_extrapolated_matches_dense():
    """Scaled lasso with compaction forced (σ-round secant extrapolation
    active) must match the dense-engine scaled lasso: the σ fixed point
    and coefficients are invariant to the accelerant."""
    X, y, _ = _gen(150, 256, 8, seed=5)
    lam = float(np.sqrt(2 * np.log(256) / 150))
    o_c = cd.IterLassoOptions(options_cd=cd.CDOptions(
        block_size=8, compact=True, compact_size=64, extrapolate=True, opt_tol=1e-10,
        randomize=False))
    o_d = cd.IterLassoOptions(options_cd=cd.CDOptions(
        block_size=8, compact=False, opt_tol=1e-10, randomize=False))
    s_c = cd.scaled_lasso(X, y, lam, options=o_c)
    s_d = cd.scaled_lasso(X, y, lam, options=o_d)
    np.testing.assert_allclose(np.asarray(s_c.x), np.asarray(s_d.x),
                               atol=1e-8)
    np.testing.assert_allclose(float(s_c.sigma), float(s_d.sigma),
                               rtol=1e-8)


def test_batched_path_matches_scan():
    """path_batch>0 (coarse scan + chunked batched certify/refine) must
    reproduce the sequential scan's certified path, including the
    max_hat_s early-stop truncation semantics — WITHOUT falling back to
    the scan (a fallback would make the equivalence assertion vacuous:
    scan compared against scan)."""
    import warnings

    rng = np.random.default_rng(23)
    n, p, s = 300, 1200, 10
    X = rng.standard_normal((n, p))
    sup = rng.choice(p, s, replace=False)
    b = np.zeros(p)
    b[sup] = rng.standard_normal(s)
    y = X @ b + 0.3 * rng.standard_normal(n)
    lam_max = float(np.abs(X.T @ y / n).max())
    lams = lam_max * np.logspace(-0.1, -2, 25)
    opts = cd.CDOptions(opt_tol=1e-10, randomize=False)
    p1 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False)
    st = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        p2 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                           path_batch=6, coarse_stride=5, stats=st)
        p4 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                           max_hat_s=15, path_batch=6, coarse_stride=5)
    # f64 runs must NEVER use the near-tol stall escape (the escape is
    # gated on stall_patience, pinned to INT32_MAX at f64)
    assert st == {"used_batched": True, "batched_certified": True,
                  "stall_escaped_lanes": 0}
    np.testing.assert_allclose(np.asarray(p2.beta_path),
                               np.asarray(p1.beta_path), atol=1e-7)
    p3 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                       max_hat_s=15)
    assert p4.beta_path.shape == p3.beta_path.shape
    np.testing.assert_allclose(np.asarray(p4.beta_path),
                               np.asarray(p3.beta_path), atol=1e-7)


def test_batched_path_saturated_working_set_falls_back():
    """When a chunk's union support saturates compact_size, the batched
    refinement cannot certify; the wrapper must fall back to the scan
    (with a warning) and return the exact scan result."""
    import warnings
    rng = np.random.default_rng(0)
    n, p = 200, 600
    X = rng.standard_normal((n, p))
    b = np.zeros(p)
    b[rng.choice(p, 60, replace=False)] = rng.standard_normal(60)
    y = X @ b + 0.1 * rng.standard_normal(n)
    lam_max = float(np.abs(X.T @ y / n).max())
    lams = lam_max * np.logspace(-0.1, -2.5, 20)
    opts = cd.CDOptions(opt_tol=1e-9, compact_size=64, randomize=False)
    p1 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False)
    st = {}
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        p2 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                           path_batch=8, stats=st)
        assert any("falling back" in str(w.message) for w in ws)
    # a fallback run reports the attempt (used_batched=True — it paid
    # the batched-attempt cost), not-certified, and no escape acceptance
    assert st == {"used_batched": True, "batched_certified": False,
                  "stall_escaped_lanes": 0}
    np.testing.assert_array_equal(np.asarray(p2.beta_path),
                                  np.asarray(p1.beta_path))


def test_batched_path_correlated_design():
    """AR(1)-correlated design (ρ=0.9): interpolated starts are poor and
    cross-coordinate coupling is strong — whether the refinement certifies
    or falls back, the returned path must equal the scan's.  This guards
    the auto-default (lasso_path now picks the batched mode on
    accelerators) in the hardest benign regime."""
    import warnings

    rng = np.random.default_rng(29)
    n, p, s = 250, 800, 8
    rho = 0.9
    Z = rng.standard_normal((n, p))
    X = np.empty_like(Z)
    X[:, 0] = Z[:, 0]
    for j in range(1, p):
        X[:, j] = rho * X[:, j - 1] + np.sqrt(1 - rho * rho) * Z[:, j]
    b = np.zeros(p)
    b[rng.choice(p, s, replace=False)] = rng.standard_normal(s)
    y = X @ b + 0.3 * rng.standard_normal(n)
    lam_max = float(np.abs(X.T @ y / n).max())
    lams = lam_max * np.logspace(-0.1, -2, 30)
    opts = cd.CDOptions(opt_tol=1e-10, randomize=False)
    p1 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        p2 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                           path_batch=8, coarse_stride=29)
    np.testing.assert_allclose(np.asarray(p2.beta_path),
                               np.asarray(p1.beta_path), atol=1e-7)


def test_batched_path_early_stop_kept_points_uncorrupted():
    """Mid-path max_hat_s truncation: post-stop lanes are frozen so they
    cannot crowd kept lanes out of the chunk's shared working set — kept
    points must match the scan."""
    rng = np.random.default_rng(0)
    n, p = 200, 600
    X = rng.standard_normal((n, p))
    b = np.zeros(p)
    b[rng.choice(p, 60, replace=False)] = rng.standard_normal(60)
    y = X @ b + 0.1 * rng.standard_normal(n)
    lam_max = float(np.abs(X.T @ y / n).max())
    lams = lam_max * np.logspace(-0.1, -2.5, 20)
    opts = cd.CDOptions(opt_tol=1e-9, compact_size=64, randomize=False)
    p3 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                       max_hat_s=40)
    p4 = cd.lasso_path(X, y, lams, options=opts, standardize_X=False,
                       max_hat_s=40, path_batch=8, coarse_stride=6)
    assert p4.beta_path.shape == p3.beta_path.shape
    np.testing.assert_allclose(np.asarray(p4.beta_path),
                               np.asarray(p3.beta_path), atol=1e-7)

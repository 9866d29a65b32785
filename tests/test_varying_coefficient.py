"""Varying-coefficient suite tests — ports of reference
test/varying_coefficient_lasso.jl patterns plus the benchmark-file oracles
(benchmark/locpoly_bench.jl alt implementations, SURVEY.md §4 pattern 2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from coordinatedescent_jl_tpu import (
    CDOptions,
    EpanechnikovKernel,
    GaussianKernel,
    WeightedLSLoss,
    ProxL1,
    coordinate_descent,
    create_kernel,
    evaluate,
    expand_X,
    get_beta,
    get_nonzero_coordinates,
    get_residuals,
    get_standard_error,
    get_standard_error_hew,
    locpoly,
    locpolyl1,
    lvocv_locpoly,
    lvocv_locpolyl1,
    refit_locpolyl1,
    split_locpoly,
    std_X,
)
from coordinatedescent_jl_tpu.models.varying_coefficient import (
    expand_Xt_w_X,
    expand_Xt_w_Y,
    expand_wX,
)

RNG = np.random.default_rng(4)
OPTS = CDOptions(opt_tol=1e-10, block_size=16)


def gen_data(n, p, seed=0):
    """sin-varying coefficients, mirroring the reference data generator
    (benchmark/locpoly_bench.jl:156-169)."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(0.02, 0.98, size=n)
    X = rng.standard_normal((n, p))
    freqs = rng.choice([2, 4, 6, 8], size=p)
    beta_z = np.sin(freqs[None, :] * z[:, None])
    y = (X * beta_z).sum(axis=1) + 0.3 * rng.standard_normal(n)
    return X, z, y


def test_kernels_match_formulas():
    # (reference test/varying_coefficient_lasso.jl:16-41)
    x = RNG.standard_normal(50)
    g = GaussianKernel(0.3)
    np.testing.assert_allclose(
        np.asarray(evaluate(g, jnp.asarray(x), 0.4)),
        np.exp(-((x - 0.4) ** 2) / 0.3) / 0.3, rtol=1e-12)
    e = EpanechnikovKernel(0.5)
    u = (x - 0.4) / 0.5
    ref = np.where(np.abs(u) >= 1, 0.0, 0.75 * (1 - u**2) / 0.5)
    np.testing.assert_allclose(
        np.asarray(evaluate(e, jnp.asarray(x), 0.4)), ref, rtol=1e-12)
    assert create_kernel(GaussianKernel, 0.2) == GaussianKernel(0.2)


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_expand_X_identities(degree):
    # hand-built row-wise Kronecker (reference test :43-92)
    n, p = 20, 3
    X = RNG.standard_normal((n, p))
    z = RNG.uniform(size=n)
    z0 = 0.37
    w = RNG.uniform(0.1, 1.0, size=n)
    y = RNG.standard_normal(n)
    eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), z0, degree))
    ref = np.zeros((n, p * (degree + 1)))
    for i in range(n):
        for j in range(p):
            for l in range(degree + 1):
                ref[i, j * (degree + 1) + l] = X[i, j] * (z[i] - z0) ** l
    np.testing.assert_allclose(eX, ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(expand_wX(jnp.asarray(w), jnp.asarray(X), jnp.asarray(z),
                             z0, degree)),
        w[:, None] * ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(expand_Xt_w_X(jnp.asarray(w), jnp.asarray(X),
                                 jnp.asarray(z), z0, degree)),
        ref.T @ np.diag(w) @ ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(expand_Xt_w_Y(jnp.asarray(w), jnp.asarray(X),
                                 jnp.asarray(z), jnp.asarray(y), z0, degree)),
        ref.T @ (w * y), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_locpoly_vs_normal_equations(degree):
    # locpoly ≡ (eX' W eX) \ (eX' W y) — the reference's locpoly_alt oracle
    # (benchmark/locpoly_bench.jl:48-67)
    n, p = 150, 3
    X, z, y = gen_data(n, p, seed=1)
    kernel = GaussianKernel(0.2)
    zgrid = np.linspace(0.05, 0.95, 7)
    out = np.asarray(locpoly(X, z, y, zgrid, degree, kernel))
    assert out.shape == (p * (degree + 1), 7)
    for k, z0 in enumerate(zgrid):
        w = np.exp(-((z - z0) ** 2) / 0.2) / 0.2
        eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), z0, degree))
        ref = np.linalg.solve(eX.T @ np.diag(w) @ eX, eX.T @ (w * y))
        np.testing.assert_allclose(out[:, k], ref, atol=1e-6)


def test_locpolyl1_matches_direct_weighted_lasso():
    # locpolyl1 per grid point ≡ weighted lasso on the expanded design with
    # std loadings — the reference's locpolyl1_alt oracle pattern
    # (benchmark/locpoly_bench.jl:72-120)
    n, p, degree = 120, 10, 1
    X, z, y = gen_data(n, p, seed=2)
    kernel = GaussianKernel(0.25)
    zgrid = np.array([0.3, 0.5, 0.7])
    lam0 = 0.05
    out, out_r = locpolyl1(X, z, y, zgrid, degree, kernel, lam0,
                           refit=True, options=OPTS)
    out = np.asarray(out)
    ep = p * (degree + 1)
    assert out.shape == (ep, 3)
    for k, z0 in enumerate(zgrid):
        w = np.exp(-((z - z0) ** 2) / 0.25) / 0.25
        eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), z0, degree))
        stdx = np.asarray(std_X(jnp.asarray(eX), jnp.asarray(w)))
        beta_ref, _ = coordinate_descent(
            jnp.zeros(ep),
            WeightedLSLoss(jnp.asarray(y), jnp.asarray(eX), jnp.asarray(w)),
            ProxL1(lam0, jnp.asarray(stdx)), OPTS)
        np.testing.assert_allclose(out[:, k], np.asarray(beta_ref),
                                   atol=1e-6)
        # refit = weighted OLS on the expanded group support (:71-76)
        S = np.asarray(get_nonzero_coordinates(out[:, k], p, degree, True))
        if S.any():
            Xs = eX[:, S]
            ref = np.linalg.solve(Xs.T @ np.diag(w) @ Xs,
                                  Xs.T @ (w * y))
            np.testing.assert_allclose(np.asarray(out_r)[S, k], ref,
                                       atol=1e-6)
            assert np.all(np.asarray(out_r)[~S, k] == 0)


def test_group_support_collapse():
    # (reference get_nonzero_coordinates!, :488-512)
    p, degree = 4, 2
    beta = np.zeros(p * (degree + 1))
    beta[0 * 3 + 1] = 1.0   # feature 0 active via slope coord
    beta[2 * 3 + 0] = -2.0  # feature 2 active via level coord
    collapsed = np.asarray(get_nonzero_coordinates(beta, p, degree, False))
    np.testing.assert_array_equal(collapsed, [True, False, True, False])
    expanded = np.asarray(get_nonzero_coordinates(beta, p, degree, True))
    ref = np.repeat(collapsed, degree + 1)
    np.testing.assert_array_equal(expanded, ref)


def test_get_beta_interpolation():
    zgrid = jnp.asarray(np.array([0.0, 0.5, 1.0]))
    bg = jnp.asarray(np.array([[1.0, 2.0, 3.0], [0.0, 10.0, 20.0]]))
    # exact grid point
    np.testing.assert_allclose(np.asarray(get_beta(zgrid, bg, 0.5)),
                               [2.0, 10.0])
    # halfway between grid points (continuous interpolation)
    np.testing.assert_allclose(np.asarray(get_beta(zgrid, bg, 0.25)),
                               [1.5, 5.0])
    # clamped outside the grid
    np.testing.assert_allclose(np.asarray(get_beta(zgrid, bg, -1.0)),
                               [1.0, 0.0])
    np.testing.assert_allclose(np.asarray(get_beta(zgrid, bg, 2.0)),
                               [3.0, 20.0])


def test_get_residuals():
    n, p, degree = 60, 2, 1
    X, z, y = gen_data(n, p, seed=3)
    zgrid = np.linspace(0.02, 0.98, 25)
    kernel = GaussianKernel(0.2)
    bg = locpoly(X, z, y, zgrid, degree, kernel)
    eps = np.asarray(get_residuals(X, z, y, zgrid, bg, degree))
    # manual: interpolate level coefficients
    bg_np = np.asarray(bg)
    for i in [0, 10, 30]:
        bi = np.asarray(get_beta(jnp.asarray(zgrid), jnp.asarray(bg_np),
                                 z[i]))
        ref = y[i] - X[i] @ bi[:: degree + 1]
        np.testing.assert_allclose(eps[i], ref, atol=1e-10)


def test_standard_errors_sandwich():
    n, p, degree = 100, 2, 1
    X, z, y = gen_data(n, p, seed=5)
    kernel = GaussianKernel(0.3)
    z0 = 0.5
    w = np.exp(-((z - z0) ** 2) / 0.3) / 0.3
    eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), z0, degree))
    A = np.linalg.inv(eX.T @ np.diag(w) @ eX)
    mid = eX.T @ np.diag(w**2) @ eX
    var = A @ mid @ A
    lvl = np.arange(p) * (degree + 1)
    se = np.asarray(get_standard_error(X, z, 2.0, z0, degree, kernel))
    np.testing.assert_allclose(se, 2.0 * np.diagonal(var)[lvl], rtol=1e-6)
    eps2 = RNG.uniform(0.5, 1.5, size=n)
    mid_h = eX.T @ np.diag(w**2 * eps2) @ eX
    var_h = A @ mid_h @ A
    se_h = np.asarray(get_standard_error_hew(X, z, eps2, z0, degree, kernel))
    np.testing.assert_allclose(se_h, np.diagonal(var_h)[lvl], rtol=1e-6)


def test_lvocv_locpoly_matches_manual_loo():
    n, p, degree = 50, 2, 1
    X, z, y = gen_data(n, p, seed=6)
    h_arr = [0.2, 0.4]
    mse = np.asarray(lvocv_locpoly(X, z, y, degree, h_arr, GaussianKernel))
    # manual LOO with row removal (the reference's view-based subproblems)
    for k, h in enumerate(h_arr):
        total = 0.0
        for i in range(n):
            keep = np.ones(n, bool)
            keep[i] = False
            w = np.exp(-((z[keep] - z[i]) ** 2) / h) / h
            eX = np.asarray(expand_X(jnp.asarray(X[keep]),
                                     jnp.asarray(z[keep]), z[i], degree))
            sw = np.sqrt(w)
            coef = np.linalg.lstsq(sw[:, None] * eX, sw * y[keep],
                                   rcond=None)[0]
            yh = X[i] @ coef[:: degree + 1]
            total += (yh - y[i]) ** 2
        np.testing.assert_allclose(mse[k], total, rtol=1e-6)


def _oracle_lvocv_locpolyl1(X, z, y, degree, h, lam0, sigma_iters=10):
    """Sequential NumPy re-derivation of the LOO-CV score
    (reference lvocv_locpolyl1, varying_coefficient_lasso.jl:82-137):
    per held-out i, a σ fixed-point loop of weighted lasso solves with a
    screened-OLS σ init, then a group-support weighted refit scored at i."""
    from oracle import cd_lasso

    n, p = X.shape
    ep = p * (degree + 1)
    s_screen = min(10, ep)
    total = 0.0
    for i in range(n):
        w = np.exp(-((z - z[i]) ** 2) / h) / h
        w[i] = 0.0
        eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), z[i],
                                 degree))
        stdX_w = np.sqrt((w[:, None] * eX * eX).sum(axis=0) / n)
        # screened weighted-OLS σ init (utils.jl:79-92)
        c = np.abs(eX.T @ (w * y))
        idx = np.argsort(-c)[:s_screen]
        Xs = eX[:, idx]
        coef = np.linalg.solve(Xs.T @ (w[:, None] * Xs), Xs.T @ (w * y))
        r = y - Xs @ coef
        sig = np.sqrt((w * r * r).sum() / w.sum())
        for _ in range(sigma_iters):
            beta, r = cd_lasso(eX, y, lam0 * sig, lamw=stdX_w, w=w,
                               tol=1e-13)
            signew = np.sqrt((w * r * r).sum() / w.sum())
            if abs(signew - sig) / sig < 1e-2:
                break
            sig = signew
        grp = np.any(beta.reshape(p, degree + 1) != 0, axis=1)
        mask = np.repeat(grp, degree + 1)
        if mask.any():
            Xa = eX[:, mask]
            br = np.linalg.solve(Xa.T @ (w[:, None] * Xa), Xa.T @ (w * y))
            yh = eX[i, mask] @ br
        else:
            yh = 0.0
        total += (yh - y[i]) ** 2
    return total


def test_lvocv_locpolyl1_matches_numpy_oracle():
    n, p, degree = 40, 4, 0
    X, z, y = gen_data(n, p, seed=7)
    h_arr = [0.3, 0.6]
    mse = np.asarray(lvocv_locpolyl1(
        X, z, y, degree, h_arr, GaussianKernel, 0.1,
        options=CDOptions(opt_tol=1e-11, block_size=8)))
    for k, h in enumerate(h_arr):
        want = _oracle_lvocv_locpolyl1(X, z, y, degree, h, 0.1)
        np.testing.assert_allclose(mse[k], want, rtol=1e-6)


def test_lvocv_locpolyl1_chunked_equals_unchunked():
    """lax.map chunking of the held-out sweep is a pure memory optimization:
    scores must be identical for any chunk size."""
    from coordinatedescent_jl_tpu.models.varying_coefficient import (
        _lvocv_locpolyl1_one_h,
    )
    import jax

    n, p, degree = 30, 3, 1
    X, z, y = gen_data(n, p, seed=11)
    opts = CDOptions(opt_tol=1e-9, block_size=8, warm_start=True)
    args = (jnp.asarray(X), jnp.asarray(z), jnp.asarray(y),
            jnp.asarray(0.4), jnp.asarray(0.1), jax.random.PRNGKey(0))
    a = _lvocv_locpolyl1_one_h(*args, degree, GaussianKernel, opts, chunk=7)
    b = _lvocv_locpolyl1_one_h(*args, degree, GaussianKernel, opts,
                               chunk=30)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_split_locpoly_matches_numpy_oracle():
    n, p, degree = 40, 4, 0
    X, z, y = gen_data(n, p, seed=7)
    Xt, zt, yt = gen_data(30, p, seed=8)
    zgrid = np.linspace(0.05, 0.95, 10)
    h_arr = [0.2, 0.5]
    mse2 = np.asarray(split_locpoly(X, z, y, Xt, zt, yt, zgrid, degree,
                                    h_arr, GaussianKernel))
    ep1 = degree + 1
    for k, h in enumerate(h_arr):
        # grid fit: √w-weighted lstsq per grid point (locpoly semantics)
        beta_grid = np.empty((p * ep1, zgrid.shape[0]))
        for g, z0 in enumerate(zgrid):
            w = np.exp(-((z - z0) ** 2) / h) / h
            eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), z0,
                                     degree))
            sw = np.sqrt(w)
            beta_grid[:, g] = np.linalg.lstsq(sw[:, None] * eX, sw * y,
                                              rcond=None)[0]
        total = 0.0
        for i in range(Xt.shape[0]):
            z0 = zt[i]
            id2 = min(max(np.searchsorted(zgrid, z0, side="left"), 0),
                      zgrid.shape[0] - 1)
            id1 = min(max(np.searchsorted(zgrid, z0, side="right") - 1, 0),
                      zgrid.shape[0] - 1)
            if id1 == id2:
                bi = beta_grid[:, id1]
            else:
                alpha = np.clip((z0 - zgrid[id1])
                                / (zgrid[id2] - zgrid[id1]), 0.0, 1.0)
                bi = (1 - alpha) * beta_grid[:, id1] \
                    + alpha * beta_grid[:, id2]
            yh = Xt[i] @ bi[::ep1]
            total += (yt[i] - yh) ** 2
        np.testing.assert_allclose(mse2[k], total, rtol=1e-6)


def test_refit_locpolyl1():
    n, p, degree = 80, 5, 1
    X, z, y = gen_data(n, p, seed=9)
    kernel = GaussianKernel(0.3)
    out, _ = locpolyl1(X, z, y, np.array([0.5]), degree, kernel, 0.05,
                       refit=False, options=OPTS)
    beta = np.asarray(out)[:, 0]
    br, S = refit_locpolyl1(X, z, y, 0.5, degree, kernel, beta)
    assert S.shape == (p,)
    assert np.asarray(br).shape == (S.sum() * (degree + 1),)


def test_sparse_coefficients_roundtrip():
    """BCOO boundary conversion of a locpolyl1-style coefficient grid —
    the reference's SparseMatrixCSC return representation
    (varying_coefficient_lasso.jl:47-48)."""
    rng = np.random.default_rng(0)
    dense = np.zeros((30, 7))
    dense[rng.choice(30, 5, replace=False), 2] = rng.standard_normal(5)
    dense[rng.choice(30, 3, replace=False), 5] = 1.0
    from coordinatedescent_jl_tpu import sparse_coefficients
    sp = sparse_coefficients(jnp.asarray(dense))
    assert sp.nse == np.count_nonzero(dense)
    np.testing.assert_array_equal(np.asarray(sp.todense()), dense)
    # static-nse variant is jit-compatible
    sp2 = sparse_coefficients(jnp.asarray(dense), nse=16)
    np.testing.assert_array_equal(np.asarray(sp2.todense()), dense)




def test_locpolyl1_grid_batch_matches_scan():
    """The batched grid execution (coarse anchors + chunked certify/
    refine with diagonal preconditioning) must reproduce the sequential
    scan — betas AND refits — WITHOUT falling back, across kernels and
    degrees (degree>1 exercises the preconditioner: the raw expanded
    columns are ~h^degree apart in scale)."""
    import warnings

    import coordinatedescent_jl_tpu as cd

    rng = np.random.default_rng(7)
    n, p, g = 200, 20, 60
    z = rng.uniform(0, 1, n)
    X = rng.standard_normal((n, p))
    y = np.sin(2 * np.pi * z) * X[:, 0] + 0.3 * rng.standard_normal(n)
    zg = np.linspace(0.05, 0.95, g)
    opts = cd.CDOptions(opt_tol=1e-10, randomize=False)
    for deg, kern in [(1, cd.GaussianKernel(0.1)),
                      (2, cd.EpanechnikovKernel(0.2))]:
        o1, r1 = cd.locpolyl1(X, z, y, zg, deg, kern, 0.05, options=opts)
        st = {}
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            o2, r2 = cd.locpolyl1(X, z, y, zg, deg, kern, 0.05,
                                  options=opts, grid_batch=16,
                                  coarse_stride=8, stats=st)
        # f64: strict certification only — the stall escape never fires
        assert st == {"used_batched": True, "batched_certified": True,
                      "stall_escaped_lanes": 0}
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                                   atol=1e-7)


def test_lvocv_locpolyl1_batched_matches_sequential():
    """cv_batch: every held-out point a lane of shared contractions,
    per-lane λ·σ fixed point — must reproduce the sequential per-point
    path without falling back (f64: strict certification)."""
    import warnings

    import coordinatedescent_jl_tpu as cd

    rng = np.random.default_rng(5)
    n, p = 120, 10
    z = rng.uniform(0, 1, n)
    X = rng.standard_normal((n, p))
    y = np.sin(2 * np.pi * z) * X[:, 0] + 0.3 * rng.standard_normal(n)
    hs = [0.08, 0.12, 0.2]
    opts = cd.CDOptions(opt_tol=1e-9, randomize=False)
    m1 = cd.lvocv_locpolyl1(X, z, y, 1, hs, cd.GaussianKernel, 0.1,
                            options=opts, cv_batch=0)
    st = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        m2 = cd.lvocv_locpolyl1(X, z, y, 1, hs, cd.GaussianKernel, 0.1,
                                options=opts, cv_batch=32, stats=st)
    assert st == {"batched_certified": True, "stall_escaped_lanes": 0,
                  "lanes_resolved_sequentially": 0}
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                               rtol=1e-10)


def test_locpolyl1_scan_chunked_bitwise():
    """Host-chunked z-grid scan ≡ the monolithic scan bitwise: the
    warm-start carry (β, secant abscissae, key) round-trips between
    segment programs unchanged.  Chunk sizes split mid-grid, per-point,
    and larger-than-grid (monolithic branch)."""
    import coordinatedescent_jl_tpu as cd

    rng = np.random.default_rng(11)
    n, p, g = 150, 12, 21
    z = rng.uniform(0, 1, n)
    X = rng.standard_normal((n, p))
    y = np.cos(2 * np.pi * z) * X[:, 1] + 0.2 * rng.standard_normal(n)
    zg = np.linspace(0.05, 0.95, g)
    opts = cd.CDOptions(opt_tol=1e-10, randomize=False)
    o1, r1 = cd.locpolyl1(X, z, y, zg, 1, cd.GaussianKernel(0.15), 0.05,
                          options=opts, grid_batch=0)
    for ch in (1, 8, 21, 50):
        o2, r2 = cd.locpolyl1(X, z, y, zg, 1, cd.GaussianKernel(0.15),
                              0.05, options=opts, grid_batch=0,
                              scan_chunk=ch)
        assert o2.shape == o1.shape and r2.shape == r1.shape
        assert bool(jnp.all(o2 == o1)), f"chunk={ch} betas diverged"
        assert bool(jnp.all(r2 == r1)), f"chunk={ch} refits diverged"
    with pytest.raises(ValueError):
        cd.locpolyl1(X, z, y, zg, 1, cd.GaussianKernel(0.15), 0.05,
                     options=opts, scan_chunk=0)


def test_locpoly_degenerate_point_falls_back_to_lstsq():
    """A grid point with zero kernel mass (compact-support kernel, z0 far
    outside the data) makes the normal-equation fast path non-finite;
    locpoly must patch it with the rank-robust lstsq fallback (min-norm
    solution — all zeros here) while fast-path points stay untouched."""
    import coordinatedescent_jl_tpu as cd

    rng = np.random.default_rng(3)
    n, p = 120, 4
    z = rng.uniform(0, 1, n)
    X = rng.standard_normal((n, p))
    y = X[:, 0] * np.sin(2 * np.pi * z) + 0.1 * rng.standard_normal(n)
    kern = cd.EpanechnikovKernel(0.1)
    zg = np.array([0.5, 50.0])          # second point: zero kernel mass
    out = np.asarray(cd.locpoly(X, z, y, zg, 1, kern))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-12)
    # the good point matches the normal-equation oracle
    from coordinatedescent_jl_tpu.models.varying_coefficient import expand_X
    w = np.asarray(cd.evaluate(kern, z, 0.5))
    eX = np.asarray(expand_X(jnp.asarray(X), jnp.asarray(z), 0.5, 1))
    ref = np.linalg.solve(eX.T @ np.diag(w) @ eX, eX.T @ (w * y))
    np.testing.assert_allclose(out[:, 0], ref, atol=1e-6)
    # scalar-z0 degenerate path too
    out_s = np.asarray(cd.locpoly(X, z, y, jnp.asarray(50.0), 1, kern))
    assert np.all(np.isfinite(out_s))


def test_locpoly_near_singular_routes_to_lstsq():
    """ADVICE r4: a NEAR-singular local fit (tiny kernel mass at an
    off-data grid point, f32) is finite but low-accuracy through the
    normal equations; the conditioning proxy must route such points to
    the rank-robust lstsq path so the whole grid matches a pure-lstsq
    reference."""
    rng = np.random.default_rng(3)
    n, p, degree = 60, 2, 1
    z = np.concatenate([rng.uniform(0.4, 0.6, n - 2),
                        np.array([0.9, 0.905])]).astype(np.float32)
    X = rng.standard_normal((n, p)).astype(np.float32)
    y = (X[:, 0] * np.sin(4 * z) + 0.1 * rng.standard_normal(n)
         ).astype(np.float32)
    kernel = GaussianKernel(0.02)
    zgrid = np.array([0.5, 0.9], np.float32)   # healthy + near-singular
    out = np.asarray(locpoly(X, z, y, zgrid, degree, kernel))
    from coordinatedescent_jl_tpu.models.varying_coefficient import (
        _locpoly_point_lstsq)
    for k, z0 in enumerate(zgrid):
        ref = np.asarray(_locpoly_point_lstsq(
            jnp.asarray(X), jnp.asarray(z), jnp.asarray(y),
            jnp.asarray(z0), degree, kernel))
        denom = max(float(np.max(np.abs(ref))), 1e-6)
        assert np.max(np.abs(out[:, k] - ref)) / denom < 5e-3, (k, z0)

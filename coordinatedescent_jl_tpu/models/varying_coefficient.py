"""Varying-coefficient (local-polynomial kernel) regression suite.

TPU-native equivalents of reference ``src/varying_coefficient_lasso.jl``:

- smoothing kernels                      — :3-21
- design expansion ``expand_X`` etc.     — :522-647 (here: one einsum)
- ``locpoly`` (low-dim, unpenalized)     — :197-235 (batched weighted lstsq,
  vmapped over the evaluation grid)
- ``locpolyl1`` (high-dim, L1)           — :30-79 (scan over the grid with
  warm-started β + weighted block-CD lasso per point)
- bandwidth selection ``lvocv_*`` /
  ``split_locpoly``                      — :82-137, :348-409 (LOO via
  weight-zeroing masks, vmapped over the held-out index)
- support / interpolation utilities      — :139-154, :237-255, :459-512
- sandwich standard errors               — :257-317

Design notes (SURVEY.md §7 delta 6): the reference mutates shared buffers
(`w`, `expandX`, `stdX`) per grid point and re-uses one ``SparseIterate`` β
across every solve in the suite; here every per-point problem is a pure
function of ``(X, z, z0)`` so grid points batch with ``vmap``/``scan``.
Warm-starting across grid points is kept where the reference forces it
(locpolyl1, :39-42) via a ``lax.scan`` carry; elsewhere (LOO-CV) points are
solved independently — warm starts only affect speed, not the converged
solution, which is what the reference's own invariance tests rely on.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.block_cd import (
    _to_blocked_beta,
    build_blocked,
    secant_alpha,
    solve_blocked,
)
from ..utils.helpers import get_sigma, std_X
from ..utils.options import CDOptions, resolve_extrapolate


# ---------------------------------------------------------------------------
# Smoothing kernels (reference varying_coefficient_lasso.jl:3-21)
# ---------------------------------------------------------------------------


class GaussianKernel(NamedTuple):
    """``evaluate = exp(−(x−y)²/h)/h`` — note: matches the reference exactly
    (varying_coefficient_lasso.jl:17), which is *not* the standard N(0, h)
    density (no √π factor, h not squared)."""

    h: float


class EpanechnikovKernel(NamedTuple):
    """``0.75 (1 − u²)/h`` for ``|u| < 1`` with ``u = (x−y)/h``
    (varying_coefficient_lasso.jl:18-21)."""

    h: float


SmoothingKernel = Union[GaussianKernel, EpanechnikovKernel]


def create_kernel(kernel_type, h) -> SmoothingKernel:
    """Factory mirroring reference ``createKernel``
    (varying_coefficient_lasso.jl:14-15)."""
    return kernel_type(h)


def evaluate(kernel: SmoothingKernel, x, y):
    """Kernel weight(s); broadcasts elementwise over ``x``/``y``."""
    if isinstance(kernel, GaussianKernel):
        return jnp.exp(-((x - y) ** 2) / kernel.h) / kernel.h
    if isinstance(kernel, EpanechnikovKernel):
        u = (x - y) / kernel.h
        return jnp.where(jnp.abs(u) >= 1.0, 0.0,
                         0.75 * (1.0 - u * u) / kernel.h)
    raise TypeError(f"unsupported kernel: {type(kernel)!r}")


# ---------------------------------------------------------------------------
# Design expansion (reference :522-647) — loops become one einsum
# ---------------------------------------------------------------------------


def expand_X(X, z, z0, degree: int):
    """Row-wise Kronecker expansion: row i is
    ``X[i, :] ⊗ [1, (z_i − z0), …, (z_i − z0)^q]`` with feature-major /
    degree-minor column order (column ``j(q+1)+l`` is ``X_j ⋅ d^l``),
    matching reference ``_expand_X!`` (:550-569)."""
    n, p = X.shape
    d = z - z0
    powers = d[:, None] ** jnp.arange(degree + 1, dtype=X.dtype)[None, :]
    return (X[:, :, None] * powers[:, None, :]).reshape(n, p * (degree + 1))


def expand_wX(w, X, z, z0, degree: int):
    """``Diag(w) ⋅ expand_X`` (reference ``_expand_wX!``, :522-544)."""
    return w[:, None] * expand_X(X, z, z0, degree)


def expand_Xt_w_X(w, X, z, z0, degree: int):
    """``eX' W eX`` (reference ``_expand_Xt_w_X!``, :572-620)."""
    eX = expand_X(X, z, z0, degree)
    return eX.T @ (w[:, None] * eX)


def expand_Xt_w_Y(w, X, z, y, z0, degree: int):
    """``eX' W y`` (reference ``_expand_Xt_w_Y!``, :622-647)."""
    eX = expand_X(X, z, z0, degree)
    return eX.T @ (w * y)


# ---------------------------------------------------------------------------
# Local polynomial regression, low-dimensional (reference :197-235)
# ---------------------------------------------------------------------------


def _locpoly_point(X, z, y, z0, degree: int, kernel: SmoothingKernel):
    """Weighted LS fit at one evaluation point: √w-scaled design + lstsq
    (reference ``_locpoly!``, :197-210, which uses in-place QR)."""
    w = jnp.sqrt(evaluate(kernel, z, z0))
    wX = expand_wX(w, X, z, z0, degree)
    coef, *_ = jnp.linalg.lstsq(wX, w * y)
    return coef


def locpoly(X, z, y, zgrid, degree: int,
            kernel: SmoothingKernel = None):
    """Local polynomial regression on a grid (or a single point).

    Reference ``locpoly`` (:217-235; default kernel ``GaussianKernel(1)``).
    Returns ``(p(degree+1), len(zgrid))`` — or a vector for scalar ``z0`` —
    in the reference's column layout.
    """
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    y = jnp.asarray(y, X.dtype)
    if kernel is None:
        kernel = GaussianKernel(1.0)
    zgrid = jnp.asarray(zgrid, X.dtype)
    if zgrid.ndim == 0:
        return _locpoly_point(X, z, y, zgrid, degree, kernel)
    fit = jax.vmap(lambda z0: _locpoly_point(X, z, y, z0, degree, kernel))
    return fit(zgrid).T


# ---------------------------------------------------------------------------
# locpolyl1: high-dimensional varying-coefficient lasso (reference :30-79)
# ---------------------------------------------------------------------------


def _group_mask_expanded(beta_e, p: int, degree: int):
    """Expanded group-support mask: all (degree+1) coords of feature j are
    active iff any of them is nonzero (reference
    ``get_nonzero_coordinates!``, :488-512, expanded=true)."""
    grp = jnp.any(beta_e.reshape(p, degree + 1) != 0, axis=1)
    return jnp.repeat(grp, degree + 1)


def _masked_weighted_refit(eX, w, y, mask):
    """Weighted OLS on the masked columns without dynamic shapes: solve the
    full normal equations with inactive rows/cols replaced by the identity
    (so inactive coefficients are exactly 0).  Matches the reference's
    ``(Xs' W Xs) \\ (Xs' W y)`` on the support (:73-75)."""
    ep = eX.shape[1]
    A = eX.T @ (w[:, None] * eX)
    b = eX.T @ (w * y)
    m2 = jnp.outer(mask, mask)
    A = jnp.where(m2, A, jnp.eye(ep, dtype=A.dtype))
    b = jnp.where(mask, b, 0.0)
    return jnp.linalg.solve(A, b)


@functools.partial(jax.jit,
                   static_argnames=("degree", "opts", "refit", "kernel_type"))
def _locpolyl1_core(X, z, y, zgrid, h, lam0, key, degree: int,
                    kernel_type, opts: CDOptions, refit: bool):
    n, p = X.shape
    ep = p * (degree + 1)
    kernel = kernel_type(h)
    beta_b0 = _to_blocked_beta(jnp.zeros((ep,), X.dtype), opts.block_size)

    def scan_body(carry, z0):
        beta_b, beta_prev, z_k, z_km1, key = carry
        beta_k = beta_b
        key, k1 = jax.random.split(key)
        # secant extrapolation of the warm start across grid points:
        # β(z0) is smooth between support changes, so shifting the start
        # along the last secant usually lands near the next solution
        # (same accelerant as block_cd._extrapolate_path_start; here the
        # residual is recomputed from scratch by the solver's init, so the
        # shift needs no cache bookkeeping).  Zero coordinates stay zero —
        # support changes are the solver's job.
        alpha = (secant_alpha(z0, z_k, z_km1, X.dtype)
                 if resolve_extrapolate(opts, True) else jnp.zeros((), X.dtype))
        start = jnp.where(beta_b != 0,
                          beta_b + alpha * (beta_b - beta_prev), 0.0)
        w = evaluate(kernel, z, z0)
        eX = expand_X(X, z, z0, degree)
        stdX = std_X(eX, w)
        prob = build_blocked("wls", opts, stdX, X=eX, y=y, w=w)
        st = solve_blocked("wls", opts, prob, lam0, start, k1)
        beta = st.beta.reshape(-1)[:ep]
        if refit:
            mask = _group_mask_expanded(beta, p, degree)
            br = _masked_weighted_refit(eX, w, y, mask)
        else:
            br = jnp.zeros((ep,), X.dtype)
        return (st.beta, beta_k, z0, z_k, key), (beta, br)

    # initialize both abscissa carries with the FIRST grid value: the
    # first two steps then see denom == 0 and skip the shift (a 0-sentinel
    # would make step 2 extrapolate from a fictitious (z=0, β=0) point on
    # ascending grids)
    z_init = zgrid[0]
    (_, _, _, _, _), (out, out_r) = lax.scan(
        scan_body, (beta_b0, beta_b0, z_init, z_init, key), zgrid)
    return out.T, out_r.T


def locpolyl1(X, z, y, zgrid, degree: int, kernel: SmoothingKernel, lam0,
              refit: bool = True, options: CDOptions = CDOptions(), *,
              seed: int = 0):
    """Varying-coefficient lasso on a grid of evaluation points.

    Reference ``locpolyl1`` (:30-79): at each z0, kernel weights + expanded
    design + weighted column loadings, then a weighted Lasso solved by CD
    with β warm-started across grid points (warm start forced, :39-42).
    Returns ``(out, out_refit)``, both ``(p(degree+1), len(zgrid))``.

    Execution is the sequential warm-started scan with secant start
    extrapolation (on by default here — measured 0.62 s vs 0.83 s on-chip
    at the bench grid, PERF.md round 3).  A batched-grid variant (coarse
    scan + chunked-vmap refinement) was built and measured in round 2/3
    and REMOVED: under ``vmap`` every chunk pays the max-lane epoch count,
    and no (stride, batch) configuration beat the scan on the TPU
    (best 1.21 s vs scan 1.02 s at the bench grid) — unlike the λ-path,
    the per-point designs (kernel weights + expansion) share no Gram, so
    the one-GEMM chunk certification that makes ``lasso_path(path_batch=…)``
    win 5× has no analogue here.
    """
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    y = jnp.asarray(y, X.dtype)
    zgrid = jnp.asarray(zgrid, X.dtype)
    opts = options.replace(warm_start=True)
    key = jax.random.PRNGKey(seed)
    return _locpolyl1_core(X, z, y, zgrid,
                           jnp.asarray(kernel.h, X.dtype),
                           jnp.asarray(lam0, X.dtype), key, degree,
                           type(kernel), opts, refit)


def refit_locpolyl1(X, z, y, z0, degree: int, kernel: SmoothingKernel,
                    beta_e):
    """Unpenalized local-polynomial refit on the collapsed group support of
    ``beta_e`` (reference ``refit_locpolyl1``, :139-154).  Returns
    ``(beta_refit, support_mask)`` where ``beta_refit`` has
    ``|S|(degree+1)`` entries, matching the reference's view-based solve."""
    beta_np = np.asarray(beta_e)
    p = np.asarray(X).shape[1]
    S = np.any(beta_np.reshape(p, degree + 1) != 0, axis=1)
    Xs = jnp.asarray(np.asarray(X)[:, S])
    br = locpoly(Xs, z, y, jnp.asarray(z0), degree, kernel)
    return br, S


# ---------------------------------------------------------------------------
# Bandwidth selection (reference :82-137, :348-409)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("degree", "opts", "kernel_type",
                                    "sigma_iters", "chunk"))
def _lvocv_locpolyl1_one_h(X, z, y, h, lam0, key, degree: int, kernel_type,
                           opts: CDOptions, sigma_iters: int = 10,
                           chunk: int = 64):
    n, p = X.shape
    ep = p * (degree + 1)
    kernel = kernel_type(h)
    s_screen = min(10, ep)

    def heldout(i, key):
        z0 = z[i]
        w = evaluate(kernel, z, z0)
        w = w.at[i].set(0.0)                       # leave one out (:108)
        eX = expand_X(X, z, z0, degree)
        stdX = std_X(eX, w)
        prob = build_blocked("wls", opts, stdX, X=eX, y=y, w=w)

        # screening init for σ (:109-117): weighted top-s OLS residuals
        c = jnp.abs(eX.T @ (w * y))
        _, idx = jax.lax.top_k(c, s_screen)
        Xs = jnp.take(eX, idx, axis=1)
        A = Xs.T @ (w[:, None] * Xs)
        b = Xs.T @ (w * y)
        r0 = y - Xs @ jnp.linalg.solve(A, b)
        sig = get_sigma(w, r0)

        beta_b0 = _to_blocked_beta(jnp.zeros((ep,), X.dtype),
                                   opts.block_size)

        # inner scaled-lasso-style σ loop, ≤ sigma_iters rounds, tol 1e-2
        # (:118-127); β warm-starts across rounds.
        def body(carry):
            beta_b, sig, it, done, key = carry
            key, k1 = jax.random.split(key)
            st = solve_blocked("wls", opts, prob, lam0 * sig, beta_b, k1)
            signew = get_sigma(w, st.r)
            done = jnp.abs(signew - sig) / sig < 1e-2
            sig = jnp.where(done, sig, signew)
            return (st.beta, sig, it + 1, done, key)

        def cond(carry):
            _, _, it, done, _ = carry
            return jnp.logical_and(~done, it < sigma_iters)

        beta_b, sig, _, _, key = lax.while_loop(
            cond, body, (beta_b0, sig, jnp.zeros((), jnp.int32),
                         jnp.zeros((), bool), key))
        beta = beta_b.reshape(-1)[:ep]

        # group-support weighted refit + prediction at the held-out row
        # (:130-134)
        mask = _group_mask_expanded(beta, p, degree)
        br = _masked_weighted_refit(eX, w, y, mask)
        yh = (eX[i] * mask) @ br
        return (yh - y[i]) ** 2

    keys = jax.random.split(key, n)
    # chunked vmap (lax.map batches of `chunk` held-out points): a full
    # vmap materializes n expanded (n, ep) designs at once — O(n²·ep)
    # memory, which blows past HBM well before n=5000; chunking caps it
    # at O(chunk·n·ep) with identical results
    errs = lax.map(lambda ik: heldout(*ik), (jnp.arange(n), keys),
                   batch_size=min(chunk, n))
    return jnp.sum(errs)


def lvocv_locpolyl1(X, z, y, degree: int, h_arr, kernel_type, lam0,
                    options: CDOptions = CDOptions(), *, seed: int = 0):
    """Leave-one-out CV for the bandwidth of ``locpolyl1``
    (reference ``lvocv_locpolyl1``, :82-137).  Returns the MSE per
    bandwidth.  Held-out points are vmapped; bandwidths loop on the host
    (the array is small)."""
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    y = jnp.asarray(y, X.dtype)
    opts = options.replace(warm_start=True)
    key = jax.random.PRNGKey(seed)
    mses = []
    for h in np.asarray(h_arr):
        mses.append(_lvocv_locpolyl1_one_h(
            X, z, y, jnp.asarray(h, X.dtype), jnp.asarray(lam0, X.dtype),
            key, degree, kernel_type, opts))
    return jnp.stack(mses)


@functools.partial(jax.jit, static_argnames=("degree", "kernel_type",
                                             "chunk"))
def _lvocv_locpoly_one_h(X, z, y, h, degree: int, kernel_type,
                         chunk: int = 256):
    n = X.shape[0]
    ep1 = degree + 1
    kernel = kernel_type(h)

    def heldout(i):
        # weight-zeroing mask ≡ the reference's row views (:357-366):
        # a √w = 0 row contributes nothing to the LS fit.
        w = jnp.sqrt(evaluate(kernel, z, z[i]))
        w = w.at[i].set(0.0)
        wX = expand_wX(w, X, z, z[i], degree)
        coef, *_ = jnp.linalg.lstsq(wX, w * y)
        yh = X[i] @ coef[::ep1]                    # level coefficients
        return (yh - y[i]) ** 2

    # chunked for the same O(n²·ep) memory reason as _lvocv_locpolyl1_one_h
    return jnp.sum(lax.map(heldout, jnp.arange(n),
                           batch_size=min(chunk, n)))


def lvocv_locpoly(X, z, y, degree: int, h_arr, kernel_type):
    """Leave-one-out CV for the ``locpoly`` bandwidth
    (reference ``lvocv_locpoly``, :348-380)."""
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    y = jnp.asarray(y, X.dtype)
    mses = [
        _lvocv_locpoly_one_h(X, z, y, jnp.asarray(h, X.dtype), degree,
                             kernel_type)
        for h in np.asarray(h_arr)
    ]
    return jnp.stack(mses)


def split_locpoly(X, z, y, X_test, z_test, y_test, zgrid, degree: int,
                  h_arr, kernel_type):
    """Train/test-split bandwidth scoring (reference ``split_locpoly``,
    :383-409): fit on the grid, interpolate β at each test z, score MSE.
    (The reference loops ``i = 1:size(X, 1)`` assuming equal train/test
    sizes; here the test size is used.)"""
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    y = jnp.asarray(y, X.dtype)
    X_test = jnp.asarray(X_test, X.dtype)
    z_test = jnp.asarray(z_test, X.dtype)
    y_test = jnp.asarray(y_test, X.dtype)
    zgrid = jnp.asarray(zgrid, X.dtype)
    ep1 = degree + 1
    mses = []
    for h in np.asarray(h_arr):
        kernel = kernel_type(jnp.asarray(h, X.dtype))
        beta_grid = locpoly(X, z, y, zgrid, degree, kernel)

        def pred(xrow, z0):
            bi = get_beta(zgrid, beta_grid, z0)
            return xrow @ bi[::ep1]

        yh = jax.vmap(pred)(X_test, z_test)
        mses.append(jnp.sum((y_test - yh) ** 2))
    return jnp.stack(mses)


# ---------------------------------------------------------------------------
# Support / interpolation utilities (reference :237-255, :459-512)
# ---------------------------------------------------------------------------


def get_beta(zgrid, beta_grid, z0):
    """Linearly interpolate the β column between the two grid points
    bracketing ``z0`` (reference ``get_beta!``, :459-476).

    Deviation from the reference (SURVEY.md §7 "decide behavior, don't copy
    bugs"): the reference's interpolation weights are swapped
    (``α·β(z1) + (1−α)·β(z2)`` with ``α = (z0−z1)/(z2−z1)``), which is
    discontinuous at grid points and is on the untested-surface list; we use
    the standard ``(1−α)·β(z1) + α·β(z2)``.  Out-of-range ``z0`` clamps to
    the boundary column.
    """
    m = zgrid.shape[0]
    id2 = jnp.clip(jnp.searchsorted(zgrid, z0, side="left"), 0, m - 1)
    id1 = jnp.clip(jnp.searchsorted(zgrid, z0, side="right") - 1, 0, m - 1)
    z1 = zgrid[id1]
    z2 = zgrid[id2]
    denom = jnp.where(id1 == id2, 1.0, z2 - z1)
    alpha = jnp.clip((z0 - z1) / denom, 0.0, 1.0)
    return (1.0 - alpha) * beta_grid[:, id1] + alpha * beta_grid[:, id2]


def get_nonzero_coordinates(beta_e, p: int, degree: int, expanded: bool):
    """Group-collapsed support: feature j is active iff any of its
    (degree+1) polynomial coordinates is nonzero (reference
    ``get_nonzero_coordinates!``, :488-512)."""
    beta_e = jnp.asarray(beta_e)
    grp = jnp.any(beta_e.reshape(p, degree + 1) != 0, axis=1)
    if expanded:
        return jnp.repeat(grp, degree + 1)
    return grp


def sparse_coefficients(beta_grid, *, nse: int = None):
    """Sparse (BCOO) view of a dense ``(ep, m)`` coefficient grid.

    The reference returns ``locpolyl1``'s coefficient grids as
    ``SparseMatrixCSC`` (varying_coefficient_lasso.jl:47-48) because the
    per-grid-point support is tiny relative to ``ep``; this framework's
    solvers return dense arrays (static shapes are what XLA compiles), so
    the sparse representation is a boundary conversion instead — call this
    on ``locpolyl1``'s outputs when ``ep × m`` is too large to keep dense.
    ``nse`` optionally fixes the stored-element count (static shape; extra
    slots are padded) so the conversion itself can run under ``jit``.
    """
    from jax.experimental import sparse

    beta_grid = jnp.asarray(beta_grid)
    return sparse.BCOO.fromdense(beta_grid, nse=nse)


def get_residuals(X, z, y, zgrid, beta_grid, degree: int,
                  kernel: SmoothingKernel = None):
    """``ε̂_i = y_i − x_i' β̂(z_i)`` using grid interpolation of the level
    coefficients (reference ``getResiduals!``, :237-255; the kernel argument
    is unused there too)."""
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    y = jnp.asarray(y, X.dtype)
    zgrid = jnp.asarray(zgrid, X.dtype)
    beta_grid = jnp.asarray(beta_grid, X.dtype)
    ep1 = degree + 1

    def resid(xrow, zi, yi):
        bi = get_beta(zgrid, beta_grid, zi)
        return yi - xrow @ bi[::ep1]

    return jax.vmap(resid)(X, z, y)


# ---------------------------------------------------------------------------
# Standard errors (reference :257-317)
# ---------------------------------------------------------------------------


def get_standard_error(X, z, sigma2, z0, degree: int,
                       kernel: SmoothingKernel):
    """Sandwich variance of the level (degree-0) coefficient per feature:
    ``σ² ⋅ diag_level[(X'WX)⁻¹ X'W²X (X'WX)⁻¹]``
    (reference ``getStandardError``, :257-286).

    Deviation: the reference accepts ``σ2`` but never multiplies by it
    (untested surface); we apply the intended ``σ²`` scaling.
    """
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    p = X.shape[1]
    w = evaluate(kernel, z, z0)
    XtwX = expand_Xt_w_X(w, X, z, z0, degree)
    XtwwX = expand_Xt_w_X(w * w, X, z, z0, degree)
    A = jnp.linalg.inv(XtwX)
    var_mat = A @ XtwwX @ A
    idx = jnp.arange(p) * (degree + 1)
    return sigma2 * jnp.diagonal(var_mat)[idx]


def get_standard_error_hew(X, z, eps_sqr, z0, degree: int,
                           kernel: SmoothingKernel):
    """Heteroscedasticity-robust sandwich variance: middle matrix uses
    ``w² ε̂²`` (reference ``getStandardErrorHEW``, :288-317)."""
    X = jnp.asarray(X)
    z = jnp.asarray(z, X.dtype)
    eps_sqr = jnp.asarray(eps_sqr, X.dtype)
    p = X.shape[1]
    w = evaluate(kernel, z, z0)
    XtwX = expand_Xt_w_X(w, X, z, z0, degree)
    Xtw_psi_wX = expand_Xt_w_X(w * w * eps_sqr, X, z, z0, degree)
    A = jnp.linalg.inv(XtwX)
    var_mat = A @ Xtw_psi_wX @ A
    idx = jnp.arange(p) * (degree + 1)
    return jnp.diagonal(var_mat)[idx]

"""Warm-started regularization paths + OLS refits.

TPU-native equivalents of reference ``src/lasso.jl:203-260``:

- ``lasso_path``        — ``LassoPath`` (lasso.jl:229-260): warm-start β
  across a decreasing λ grid, early-stop when the support size exceeds
  ``max_hat_s``.
- ``refit_lasso_path``  — ``refitLassoPath`` (lasso.jl:208-225): one OLS
  refit per distinct support.

The path solve is a single XLA program: a ``lax.scan`` over λ points
carrying ``(β, residuals, active mask)``; early stopping is a carried flag
that turns later solves into no-ops (dynamic shapes are not TPU-friendly, so
truncation happens on the host afterwards).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.block_cd import (
    _compact_mode,
    _empty_ws_cache,
    _extrapolate_path_start,
    _init_state,
    _solve_at_lambda_ws,
    _to_blocked_beta,
    build_blocked,
    solve_blocked,
)
from ..utils.helpers import std_X
from ..utils.options import CDOptions


class LassoPath(NamedTuple):
    """Mirrors reference ``LassoPath`` (lasso.jl:203-206); ``beta_path`` is a
    dense ``(num_lambda, p)`` matrix (zeros encode sparsity)."""

    lam_path: jnp.ndarray   # (num_lambda,)
    beta_path: jnp.ndarray  # (num_lambda, p)


@functools.partial(jax.jit, static_argnames=("opts",))
def _lasso_path_core(X, y, lam_path, lamw, key, max_hat_s,
                     opts: CDOptions):
    prob = build_blocked("ls", opts, lamw, X=X, y=y)
    p = X.shape[1]
    n_scale = jnp.asarray(y.shape[0], X.dtype)
    beta_b0 = _to_blocked_beta(jnp.zeros((p,), X.dtype), opts.block_size)
    # the FULL solver state is carried across path points: the residual is
    # maintained exactly by the passes (no per-point re-initialization
    # sweep over X), and the confirming KKT sweep's cached gradient is
    # λ-independent, so the next point's first full check is O(p) — two of
    # the three O(n·p) X reads per path point disappear vs naive warm
    # starting (the reference re-runs initialize! per point, lasso.jl:250)
    st0 = _init_state("ls", prob, beta_b0, key)
    # the compaction working-set cache rides the path carry: the support
    # only grows along a decreasing λ grid, so most points reuse one gather
    nc = _compact_mode("ls", opts, prob, X.dtype)
    cache0 = _empty_ws_cache("ls", prob, nc, opts) if nc else None

    def scan_body(carry, lam):
        st, cache, beta_prev, lam_k, lam_km1, stopped = carry
        beta_k = st.beta

        def do(args):
            st, cache = args
            key, k1 = jax.random.split(st.key)
            if opts.warm_start:
                if nc and opts.extrapolate:
                    # secant extrapolation along the path: β(λ) is
                    # piecewise linear, so the shifted start usually lands
                    # within rounding of the next solution; the shift's
                    # residual update uses only the cached working-set
                    # columns (see _extrapolate_path_start)
                    st = _extrapolate_path_start(st, cache, beta_prev,
                                                 lam_k, lam_km1, lam)
                return _solve_at_lambda_ws("ls", opts, prob, lam,
                                           st._replace(key=k1), n_scale,
                                           cache)
            # warm_start=False: the reference zeroes β and re-runs the full
            # λ-continuation at every path point (lasso.jl:250-252 with
            # warmStart=false, coordinate_descent.jl:24-37)
            return solve_blocked("ls", opts, prob, lam,
                                 jnp.zeros_like(st.beta), k1), cache

        st, cache = lax.cond(stopped, lambda a: a, do, (st, cache))
        valid = ~stopped
        nnz = jnp.sum(st.beta != 0)
        # the point that first exceeds max_hat_s is still recorded
        # (lasso.jl:253-256)
        stopped = stopped | (nnz > max_hat_s)
        return (st, cache, beta_k, lam, lam_k, stopped), (st.beta, valid)

    # both abscissa carries start at the first path value so the first two
    # steps skip the shift (block_cd.secant_alpha)
    lam_init = lam_path[0]
    (_, _, _, _, _, _), (betas, valids) = lax.scan(
        scan_body,
        (st0, cache0, st0.beta, lam_init, lam_init, jnp.zeros((), bool)),
        lam_path)
    return betas.reshape(betas.shape[0], -1)[:, :p], valids


def lasso_path(X, y, lam_path, options: CDOptions = CDOptions(), *,
               max_hat_s: float = np.inf, standardize_X: bool = True,
               seed: int = 0) -> LassoPath:
    """Solve the Lasso along a **decreasing** λ grid with warm starts.

    Reference ``LassoPath`` (lasso.jl:229-260).  With ``standardize_X`` the
    per-coordinate penalty weights are the column RMS loadings
    (lasso.jl:237-242).  The path is truncated after the first point whose
    support size exceeds ``max_hat_s`` (that point is kept, matching the
    reference's ``resize!`` semantics).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y, X.dtype)
    lam_path = jnp.asarray(lam_path, X.dtype)
    lamw = std_X(X) if standardize_X else jnp.ones((X.shape[1],), X.dtype)
    key = jax.random.PRNGKey(seed)
    betas, valids = _lasso_path_core(
        X, y, lam_path, lamw, key, jnp.asarray(max_hat_s, X.dtype), options)
    valids = np.asarray(valids)
    k = int(valids.sum())
    return LassoPath(lam_path[:k], betas[:k])


def refit_lasso_path(path: LassoPath, X, y) -> Dict[Tuple[int, ...],
                                                     np.ndarray]:
    """Least-squares refit on each *distinct* support along the path.

    Reference ``refitLassoPath`` (lasso.jl:208-225): returns a dict mapping
    the support (tuple of 0-based indices) to the OLS coefficients
    ``X[:, S] \\ y``.
    """
    Xn = np.asarray(X)
    yn = np.asarray(y)
    out: Dict[Tuple[int, ...], np.ndarray] = {}
    beta_np = np.asarray(path.beta_path)
    for i in range(beta_np.shape[0]):
        S = tuple(np.nonzero(beta_np[i])[0].tolist())
        if S in out:
            continue
        if len(S) == 0:
            out[S] = np.zeros((0,), dtype=Xn.dtype)
        else:
            out[S] = np.linalg.lstsq(Xn[:, list(S)], yn, rcond=None)[0]
    return out

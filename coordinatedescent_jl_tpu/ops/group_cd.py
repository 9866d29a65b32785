"""Group-coordinate (atom) descent engine.

TPU-native implementation of the reference driver's ``AtomIterate``
acceptance (``src/coordinate_descent.jl:8``): ProximalBase's
``AtomIterate`` splits the iterate into equal-size atoms and ``cdprox!``
applies the ℓ2 prox per atom, i.e. the solved problem is the group Lasso

    min_β ‖y − Xβ‖² / (2n) + λ0 Σ_g ω_g ‖β_g‖₂ .

Design mirrors the scalar block engine (block_cd.py), with the group as
the unit of work — which maps even better onto the hardware, since a group
visit is naturally lane-dense:

- ``X`` is stored group-blocked ``(ng, n, G)``; a group visit is one
  contiguous dynamic-index load feeding two MXU contractions
  (``c = X_g'r`` and the ``G×G`` Gram).
- The per-group subproblem has no closed form for general ``X_g``; the
  visit runs ``block_iters`` MM (proximal-gradient) steps with the exact
  majorizer ``L_g ≥ λmax(X_g'X_g)`` (computed once by batched power
  iteration at build), using the Gram recursion to avoid re-reading ``X``.
  Inexact visits are sound for exactly the same reason as the scalar
  engine's ISTA inner: convergence is declared only by the
  order-independent fixed-point sweep below.
- Full sweep: ``c = X'r`` for every group at once; the per-group optimality
  measure is one prox-gradient step from the current iterate (zero iff the
  group satisfies the group-KKT conditions).  The reference's
  two-consecutive-converged-passes rule (coordinate_descent.jl:72-90), the
  active-group mask, λ-continuation and the f32 stall detector all carry
  over unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .prox import ProxL1Group, group_soft_threshold
from ..utils.options import CDOptions

_PREC = lax.Precision.HIGHEST


class GroupProblem(NamedTuple):
    """Group-blocked problem data."""

    Xg: jnp.ndarray     # (ng, n, G) column groups
    y: jnp.ndarray      # (n,)
    Lg: jnp.ndarray     # (ng,) majorizer ≥ λmax(X_g'X_g)
    lamw: jnp.ndarray   # (ng,) per-group penalty weights
    valid: jnp.ndarray  # (ng, G) padding mask


class GroupState(NamedTuple):
    beta: jnp.ndarray    # (ng, G)
    r: jnp.ndarray       # (n,)
    active: jnp.ndarray  # (ng,) bool
    key: jnp.ndarray
    it: jnp.ndarray
    conv: jnp.ndarray
    done: jnp.ndarray


def _build_group_problem(X, y, lamw_g, G: int) -> GroupProblem:
    n, p = X.shape
    ng = -(-p // G)
    P = ng * G
    if P != p:
        X = jnp.pad(X, ((0, 0), (0, P - p)))
    Xg = X.reshape(n, ng, G).transpose(1, 0, 2)
    valid = (jnp.arange(P).reshape(ng, G) < p)
    # batched power iteration for λmax(X_g'X_g) (tight majorizer; safety
    # factor absorbs the finite iteration count and rounding).  The start
    # vector is RANDOM: a deterministic start (e.g. all-ones) can be
    # exactly orthogonal to the dominant eigenspace — a group containing an
    # anti-correlated column pair (x, −x) gives K·1 = 0, collapsing the
    # estimate to ~0 and the MM visits to NaN.
    v = jax.random.normal(jax.random.PRNGKey(7), (ng, G), X.dtype)
    v = v / jnp.maximum(
        jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True)), 1e-30)

    def it_body(v, _):
        w = jnp.einsum("gnk,gk->gn", Xg, v, precision=_PREC)
        v2 = jnp.einsum("gnk,gn->gk", Xg, w, precision=_PREC)
        lam = jnp.sqrt(jnp.sum(v2 * v2, axis=1, keepdims=True))
        return v2 / jnp.maximum(lam, 1e-30), lam[:, 0]

    v, lams = lax.scan(it_body, v, None, length=12)
    # Rayleigh estimate after the last normalized step.  trace ≥ λmax is
    # the always-safe cap; it is ALSO the fallback whenever the estimate is
    # degenerate (≲ eps·trace) — flooring with a tiny constant instead
    # would make L ≪ λmax and the MM steps divergent (NaN β).  A too-large
    # L only slows visits; soundness is unaffected (the fixed-point sweep
    # characterizes KKT for any L > 0).
    trace = jnp.einsum("gnk,gnk->g", Xg, Xg, precision=_PREC)
    est = lams[-1] * 1.05
    eps = jnp.asarray(jnp.finfo(X.dtype).eps, X.dtype)
    Lg = jnp.where(est > 16.0 * eps * trace,
                   jnp.minimum(est, trace), trace) + 1e-12
    return GroupProblem(Xg=Xg, y=y, Lg=Lg, lamw=jnp.asarray(lamw_g, X.dtype),
                        valid=valid)


def _mm_visit(K, c0, beta0, L, thr, iters: int):
    """``iters`` proximal-gradient (MM) steps on one group's subproblem.

    Entering residual gradient ``c0 = X_g'r``; the running gradient at
    iterate ``b`` is ``c0 − K (b − beta0)`` (Gram recursion — no X reads).
    ``thr = n·λ0·ω_g / L`` is the prox level per step."""

    def body(b, _):
        grad = c0 - jnp.dot(K, b - beta0, precision=_PREC)
        z = b + grad / L
        return group_soft_threshold(z, thr, axis=0, keepdims=False), None

    b, _ = lax.scan(body, beta0, None, length=iters)
    return b


def _group_active_pass(prob: GroupProblem, st: GroupState, lam0, n_scale,
                       randomize: bool, iters: int):
    """One Gauss-Seidel pass over the active groups (reference nonzero
    pass, coordinate_descent.jl:94-110, at atom granularity)."""
    ng, G = prob.lamw.shape[0], prob.Xg.shape[2]
    key, k1 = jax.random.split(st.key)
    order = (jax.random.permutation(k1, ng) if randomize
             else jnp.arange(ng))

    def body(t, carry):
        beta, r, maxh = carry
        g = order[t]

        def do(args):
            beta, r, maxh = args
            Xg_g = prob.Xg[g]
            c0 = jnp.dot(Xg_g.T, r, precision=_PREC)
            K = jnp.dot(Xg_g.T, Xg_g, precision=_PREC,
                        preferred_element_type=Xg_g.dtype)
            L = prob.Lg[g]
            thr = n_scale * lam0 * prob.lamw[g] / jnp.maximum(L, 1e-30)
            b0 = beta[g]
            b1 = _mm_visit(K, c0, b0, L, thr, iters)
            b1 = jnp.where(prob.valid[g], b1, 0.0)
            h = b1 - b0
            r2 = r - jnp.dot(Xg_g, h, precision=_PREC)
            return (beta.at[g].set(b1), r2,
                    jnp.maximum(maxh, jnp.max(jnp.abs(h))))

        return lax.cond(st.active[g], do, lambda a: a, (beta, r, maxh))

    zero = jnp.zeros((), st.beta.dtype)
    beta, r, maxh = lax.fori_loop(0, ng, body, (st.beta, st.r, zero))
    active = jnp.any(beta != 0, axis=1)
    return st._replace(beta=beta, r=r, active=active, key=key), maxh


def _group_full_check(prob: GroupProblem, st: GroupState, lam0, n_scale,
                      opt_tol):
    """Vectorized fixed-point sweep: one prox-gradient step per group from
    the current iterate — zero iff the group-KKT conditions hold
    (for β_g = 0: ‖X_g'r‖₂ ≤ n·λ0·ω_g; else X_g'r = n·λ0·ω_g·β_g/‖β_g‖).
    Groups with steps ≥ tol are (re)activated."""
    c = jnp.einsum("gnk,n->gk", prob.Xg, st.r, precision=_PREC)
    L = jnp.maximum(prob.Lg, 1e-30)[:, None]
    z = st.beta + c / L
    thr = (n_scale * lam0 * prob.lamw / jnp.maximum(prob.Lg, 1e-30))[:, None]
    bstar = group_soft_threshold(z, thr, axis=1, keepdims=True)
    h = jnp.where(prob.valid, bstar - st.beta, 0.0)
    habs = jnp.abs(h)
    maxh = jnp.max(habs)
    viol = jnp.any(habs >= opt_tol, axis=1)
    active = jnp.any(st.beta != 0, axis=1) | viol
    return st._replace(active=active), maxh


def _group_solve_at_lambda(opts: CDOptions, prob: GroupProblem, lam0,
                           st: GroupState, n_scale) -> GroupState:
    """Epoch loop: alternate full sweeps / active passes until two
    consecutive converged passes (full confirming), with the f32 stall
    escape — structurally identical to block_cd._solve_at_lambda."""
    tol = opts.opt_tol
    dtype = st.beta.dtype
    patience = (opts.stall_patience
                if jnp.dtype(dtype).itemsize < 8 else jnp.iinfo(jnp.int32).max)

    def cond(c):
        s, best, stall = c
        return jnp.logical_and(~s.done, s.it < opts.max_iter)

    def body(c):
        s, best, stall = c
        was_full = s.conv

        def full(s):
            return _group_full_check(prob, s, lam0, n_scale, tol)

        def act(s):
            return _group_active_pass(prob, s, lam0, n_scale,
                                      opts.randomize, opts.block_iters)

        s2, maxh = lax.cond(was_full, full, act, s)
        conv = maxh < tol
        improved = was_full & (maxh < best)
        stall = jnp.where(was_full,
                          jnp.where(improved, 0, stall + 1), stall)
        best = jnp.where(was_full, jnp.minimum(best, maxh), best)
        done = (was_full & conv) | (stall >= patience)
        return (s2._replace(it=s.it + 1, conv=conv, done=done), best, stall)

    st = st._replace(it=jnp.zeros((), jnp.int32), conv=jnp.ones((), bool),
                     done=jnp.zeros((), bool))
    init = (st, jnp.asarray(jnp.inf, dtype), jnp.zeros((), jnp.int32))
    st, _, _ = lax.while_loop(cond, body, init)
    return st


def _group_lambda_max(prob: GroupProblem, st: GroupState, n_scale):
    """Smallest λ0 with all-zero solution: ``max_g ‖X_g'y‖₂ / (n·ω_g)``."""
    c = jnp.einsum("gnk,n->gk", prob.Xg, st.r, precision=_PREC)
    nrm = jnp.sqrt(jnp.sum(jnp.where(prob.valid, c, 0.0) ** 2, axis=1))
    return jnp.max(nrm / (n_scale * jnp.maximum(prob.lamw, 1e-30)))


@functools.partial(jax.jit, static_argnames=("G", "opts"))
def _group_cd_core(X, y, lam0, lamw_g, beta0, key, G: int,
                   opts: CDOptions):
    n, p = X.shape
    dtype = X.dtype
    prob = _build_group_problem(X, y, lamw_g, G)
    ng = prob.lamw.shape[0]
    beta_g = jnp.pad(beta0, (0, ng * G - p)).reshape(ng, G)
    n_scale = jnp.asarray(n, dtype)
    lam0 = jnp.asarray(lam0, dtype)

    def init_state(beta_g, key):
        r = prob.y - jnp.einsum("gnk,gk->n", prob.Xg, beta_g,
                                precision=_PREC)
        return GroupState(beta=beta_g, r=r,
                          active=jnp.any(beta_g != 0, axis=1), key=key,
                          it=jnp.zeros((), jnp.int32),
                          conv=jnp.ones((), bool),
                          done=jnp.zeros((), bool))

    if opts.warm_start:
        st = _group_solve_at_lambda(opts, prob, lam0,
                                    init_state(beta_g, key), n_scale)
    else:
        st = init_state(jnp.zeros_like(beta_g), key)
        lammax = _group_lambda_max(prob, st, n_scale)
        ts = jnp.linspace(jnp.log(lammax), jnp.log(lam0),
                          opts.num_steps + 1)

        def scan_body(s, lam):
            return _group_solve_at_lambda(opts, prob, jnp.exp(lam), s,
                                          n_scale), None

        st, _ = lax.scan(scan_body, st, ts)
    return st.beta.reshape(-1)[:p], st.r


def group_coordinate_descent(beta0, loss, penalty: ProxL1Group,
                             options: CDOptions = CDOptions(), *,
                             seed: int = 0, key=None):
    """Minimize ``loss(β) + λ0 Σ_g ω_g ‖β_g‖₂`` over equal-size consecutive
    groups — the reference driver with an ``AtomIterate``
    (coordinate_descent.jl:8).  Supports the least-squares loss.
    Returns ``(beta, residuals)``."""
    from .losses import LeastSquaresLoss

    if not isinstance(loss, LeastSquaresLoss):
        raise TypeError("group penalty currently supports the "
                        "least-squares loss")
    X, y = loss.X, loss.y
    p = X.shape[1]
    G = int(penalty.group_size)
    if G < 1:
        raise ValueError("group_size must be ≥ 1")
    ng = -(-p // G)
    dtype = X.dtype
    lamw_g = (jnp.ones((ng,), dtype) if penalty.weights is None
              else jnp.asarray(penalty.weights, dtype))
    if lamw_g.shape != (ng,):
        raise ValueError(f"group weight vector has shape {lamw_g.shape}, "
                         f"expected ({ng},)")
    if key is None:
        key = jax.random.PRNGKey(seed)
    return _group_cd_core(X, jnp.asarray(y, dtype),
                          jnp.asarray(penalty.lam0, dtype), lamw_g,
                          jnp.asarray(beta0, dtype), key, G, options)


def group_lasso(X, y, lam, group_size: int, weights=None,
                options: CDOptions = CDOptions(), *, seed: int = 0):
    """Group Lasso over consecutive equal-size groups:
    ``min ‖y−Xβ‖²/(2n) + λ Σ_g ω_g ‖β_g‖₂``.  Returns a
    ``LassoSolution`` like :func:`~coordinatedescent_jl_tpu.lasso`."""
    from ..models.lasso import LassoSolution
    from ..utils.helpers import sample_std
    from .losses import LeastSquaresLoss

    X = jnp.asarray(X)
    y = jnp.asarray(y, X.dtype)
    g = ProxL1Group(jnp.asarray(lam, X.dtype), int(group_size),
                    None if weights is None else jnp.asarray(weights,
                                                             X.dtype))
    beta0 = jnp.zeros((X.shape[1],), X.dtype)
    beta, r = group_coordinate_descent(beta0, LeastSquaresLoss(y, X), g,
                                       options, seed=seed)
    return LassoSolution(beta, r, g, sample_std(r))

"""Active-set float64 polish: from an f32 solve to the 1e-7 duality gap.

The f32 engine certifies at its computational noise floor (rel gap
~1e-6, PERF.md); BASELINE.json's metric is time-to-**1e-7** gap.  SURVEY
§7 hard-part (d) planned "float64 or compensated float32 accumulation on
TPU" for exactly this step.  ``polish_lasso`` closes the last decade the
TPU-native way:

1. the f32 solution's support (plus slack) becomes a static-size working
   set ``S``;
2. the restricted problem — exactly the reference's covariance/Gram form,
   ``CDQuadraticLoss(X_S'X_S, −X_S'y)`` (cd_differentiable_function.jl:
   299-348, the form the reference's own tests use to cross-check the
   design form, test/lasso.jl:48/88) — is solved by cyclic exact
   coordinate descent in TRUE f64 (the Gram fits easily; XLA's f64
   emulation is fine at (C, C) scale, while a full-design f64 program
   would OOM — see ops/compensated.py);
3. one compensated full KKT sweep certifies ALL p coordinates — the
   hybrid ``grad_f64_certified`` (exact f64 on the near-max edge set,
   rigorously-bounded f32 elsewhere; exact for both certificate
   consumers, ~6× cheaper than the full f64-emulated sweep on TPU);
   coordinates
   that violate join ``S`` and the loop repeats (classic active-set
   safeguard — same working-set-soundness argument as
   ``block_cd._compact_pass``: frozen coordinates are re-checked by the
   next full sweep);
4. done when the measurement-grade relative gap ≤ ``target_rel_gap``.

The returned β is float64.  Casting it back to f32 loses ~eps·|β_j| per
coordinate, which re-inflates the gap toward the f32 representation
floor — the polished certificate belongs to the f64 iterate, so keep it
f64 (it is tiny: one (p,) vector).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.compensated import (_require_x64, fenchel_gap_f64,
                               grad_f64_certified, residual_f64)

_PREC = lax.Precision.HIGHEST


class PolishResult(NamedTuple):
    beta: np.ndarray        # (p,) float64 polished coefficients
    gap: float              # absolute duality gap of beta
    rel_gap: float          # gap / primal
    primal: float
    rounds: int             # active-set rounds used
    support_size: int       # final working-set occupancy (nnz candidates)
    converged: bool         # rel_gap <= target


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def _restricted_cd_f64(Ks, cs, thr, beta0, tol, max_sweeps: int = 400):
    """Cyclic exact coordinate descent on the f64 Gram form
    ``½β'Kβ − c'β + Σ_j thr_j |β_j|`` — the reference's per-coordinate
    quadratic-loss update (cd_differentiable_function.jl:324-348) with
    the maintained ``Kβ`` vector, run to the reference's maxH rule
    (coordinate_descent.jl:83-89) at an f64 tolerance.  Padded slots
    (zero Gram diagonal + huge threshold) stay pinned at 0."""
    C = Ks.shape[0]
    Kd = jnp.diagonal(Ks)
    # magnitude guards stay within the FLOAT32 exponent range: TPU f64 is
    # emulated as a double-f32 pair (~49-bit mantissa, f32 exponent), so
    # 1e-300 would underflow to 0 and finfo(f64).max would overflow
    a = jnp.maximum(Kd, jnp.asarray(1e-30, Ks.dtype))

    def visit(carry, j):
        beta, kb, mx = carry
        g = cs[j] - kb[j]
        z = beta[j] + g / a[j]
        bn = jnp.sign(z) * jnp.maximum(jnp.abs(z) - thr[j] / a[j], 0.0)
        d = bn - beta[j]
        kb = kb + jnp.take(Ks, j, axis=1) * d
        beta = beta.at[j].set(bn)
        return (beta, kb, jnp.maximum(mx, jnp.abs(d))), None

    def sweep(state):
        beta, kb, it, _ = state
        (beta, kb, mx), _ = lax.scan(
            visit, (beta, kb, jnp.zeros((), Ks.dtype)), jnp.arange(C))
        return beta, kb, it + 1, mx

    def cond(state):
        _, _, it, mx = state
        return jnp.logical_and(mx > tol, it < max_sweeps)

    kb0 = jnp.dot(Ks, beta0, precision=_PREC)
    big = jnp.asarray(jnp.finfo(Ks.dtype).max, Ks.dtype)
    beta, _, it, mx = lax.while_loop(
        cond, sweep, (beta0, kb0, jnp.zeros((), jnp.int32), big))
    return beta, it, mx


@jax.jit
def _gather_restricted(X, y, lamw, idx, lam_n):
    """f64 Gram pieces of the working set: ``K = X_S'X_S``,
    ``c = X_S'y``, per-coordinate thresholds ``n·λ·w_S`` (padded slots:
    zero column + effectively infinite threshold).

    The Gram is assembled COLUMN-BY-COLUMN as matvecs: on TPU, XLA's f64
    emulation gives true f64 accumulation only for matrix-VECTOR
    contractions (measured 2.6e-15 relative); a matrix-matrix f64
    product — any precision, any operand dtype — lands on an MXU
    decomposition with ~3e-8 relative error, which showed up as exactly
    the 2e-7 gap floor this module exists to remove."""
    p = X.shape[1]
    C = idx.shape[0]
    Xs = jnp.take(X, idx, axis=1, mode="fill", fill_value=0)

    def col(k):
        xk = jnp.take(Xs, k, axis=1)
        return jnp.einsum("nj,n->j", Xs, xk, precision=_PREC,
                          preferred_element_type=jnp.float64)

    Ks = lax.map(col, jnp.arange(C))          # symmetric: order-free
    cs = jnp.einsum("nj,n->j", Xs, y, precision=_PREC,
                    preferred_element_type=jnp.float64)
    # 1e30 (not finfo.max): must survive the TPU's double-f32 emulation
    # of f64, whose exponent range is f32's
    thr = jnp.take(lamw, idx, mode="fill", fill_value=1e30)
    thr = jnp.where(idx < p, thr * lam_n, 1e30)
    return Ks, cs, thr


def polish_lasso(X, y, beta, lam0, weights=None, *,
                 target_rel_gap: float = 1e-7, max_rounds: int = 6,
                 support_cap: int = 4096,
                 col_chunk: int = 4096) -> PolishResult:
    """Refine an (f32) Lasso solution to ``rel gap ≤ target_rel_gap``.

    ``beta`` is the engine's solution at penalty level ``lam0`` (per-
    coordinate weights ``weights``, the reference's ``ProxL1(λ0, ω)``).
    Host-driven active-set loop; every numerical step is f64-accumulated
    (see module docstring).  Requires ``jax_enable_x64``.  If the support
    outgrows ``support_cap`` the loop stops early with
    ``converged=False`` — the gap of the best iterate is still reported
    honestly.
    """
    _require_x64("polish_lasso")
    X = jnp.asarray(X)
    n, p = X.shape
    y = jnp.asarray(y)
    lam0 = float(lam0)
    w_np = (np.ones((p,), np.float64) if weights is None
            else np.asarray(weights, np.float64))
    lamw = jnp.asarray(w_np)
    beta_np = np.asarray(beta, np.float64)
    yn = np.asarray(y, np.float64)
    y2 = float(yn @ yn)

    def host_gap(r_np, g_np, beta_full):
        # single-sourced certificate formula (ops.compensated)
        return fenchel_gap_f64(r_np, g_np, beta_full, lam0, w_np, n, yn,
                               y2=y2)

    sup = np.nonzero(beta_np)[0]
    C = min(p, min(support_cap,
                   max(256, -(-(sup.size + 128) // 128) * 128)))
    rounds = 0
    converged = False
    gap = rel = primal = float("nan")
    tol_inner = np.float64(
        1e-13 * max(1.0, float(np.max(np.abs(beta_np)) or 1.0)))
    while True:
        if sup.size > min(support_cap, p):
            # support exceeds the cap: certify the CURRENT iterate (one
            # oversized gather — host-driven, once) so the reported gap
            # is honest, then stop with converged=False
            r64 = residual_f64(X, y, jnp.asarray(sup),
                               jnp.asarray(beta_np[sup]))
            g64 = grad_f64_certified(X, r64, n * lam0 * w_np,
                                     col_chunk=min(col_chunk, p))
            gap, primal = host_gap(np.asarray(r64), np.asarray(g64),
                                   beta_np)
            rel = gap / max(primal, 1e-300)
            break
        if sup.size > C:
            # re-grow the working-set allocation to the next 128 multiple
            C = min(p, -(-sup.size // 128) * 128)
        idx_np = np.full((C,), p, np.int64)
        idx_np[:sup.size] = sup
        beta_s0 = np.zeros((C,), np.float64)
        beta_s0[:sup.size] = beta_np[sup]
        idx = jnp.asarray(idx_np)
        Ks, cs, thr = _gather_restricted(X, y, lamw, idx,
                                         jnp.asarray(n * lam0,
                                                     jnp.float64))
        beta_s, _, _ = _restricted_cd_f64(Ks, cs, thr,
                                          jnp.asarray(beta_s0),
                                          jnp.asarray(tol_inner))
        beta_s_np = np.asarray(beta_s)
        beta_np = np.zeros((p,), np.float64)
        beta_np[idx_np[idx_np < p]] = beta_s_np[idx_np < p]
        # compensated full certificate: exact residual off the working
        # set, f64-accumulated gradient over all p
        r64 = residual_f64(X, y, idx, beta_s)
        # hybrid sweep: exact on the near-max edge set, bounded-f32
        # elsewhere — exact for BOTH consumers here (the gap's ratio max
        # and the clipped violation ranking); see grad_f64_certified
        g64 = grad_f64_certified(X, r64, n * lam0 * w_np,
                                 col_chunk=min(col_chunk, p))
        r_np = np.asarray(r64)
        g_np = np.asarray(g64)
        gap, primal = host_gap(r_np, g_np, beta_np)
        rel = gap / max(primal, 1e-300)
        rounds += 1
        if rel <= target_rel_gap:
            converged = True
            break
        if rounds >= max_rounds:
            break
        # augment: support + the strongest off-set violations
        viol = np.maximum(np.abs(g_np) / n - lam0 * w_np, 0.0)
        viol[idx_np[idx_np < p]] = 0.0
        sup_now = np.nonzero(beta_np)[0]
        extra = np.nonzero(viol > 0)[0]
        # the working set may GROW past its current allocation (the loop
        # top re-sizes C): room is bounded by support_cap, and per-round
        # additions by max(256, C) so one loose coarse solve cannot force
        # a single enormous gather — growth is geometric instead
        room = max(0, min(support_cap, p) - sup_now.size)
        extra = extra[np.argsort(-viol[extra])][: min(room, max(256, C))]
        new_sup = np.union1d(sup_now, extra)
        if new_sup.size == sup.size and np.array_equal(new_sup, sup):
            # no new candidates and gap still above target: the residual
            # decade must come from more inner sweeps — tighten and retry
            tol_inner = tol_inner / 10.0
        sup = new_sup

    return PolishResult(beta=beta_np, gap=float(gap), rel_gap=float(rel),
                        primal=float(primal), rounds=rounds,
                        support_size=int(sup.size), converged=converged)

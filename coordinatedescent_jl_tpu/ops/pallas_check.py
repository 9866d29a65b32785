"""Pallas TPU kernels: the fused KKT full check (ls/wls, f32).

TPU re-design of the reference's convergence check — the full KKT pass
over every coordinate (coordinate_descent.jl:65-92 checks convergence by
sweeping all p coordinates each epoch).  This engine's check is already
O(read-only-what-moved) in X traffic (block_cd._full_check: cached
gradients + drift-ball certification + gap-safe screening), but its
*math* — screening bounds, stale-step certification, potential steps,
noise floor, reductions — lowers to ~100 small ``(nb, B)`` XLA ops.
At the benchmark shape those arrays are ~400 KB: every op is pure
dispatch/launch latency, and the PERF.md round-5 decomposition measured
that latency at over half of the sequential λ-path scan floor.

Each kernel here runs the ENTIRE check math as ONE ``pallas_call`` with
no grid: every operand is a whole-array VMEM block (the fused path is
statically gated on the footprint fitting VMEM — ``fused_check_fits``),
and the bodies call the exact raw-array cores the plain XLA path uses
(``block_cd._gap_safe_core`` / ``_stale_core_ls`` / ``_habs_reduce_core``),
so fused and plain checks are formula-identical by construction.

- ``check_phase_a``: the complete no-refresh evaluation + the ``need``
  refresh mask.  When no block needs a gradient refresh (the common
  confirming check — drift certificates cover the rest), this one kernel
  IS the whole full check.
- ``check_phase_b``: re-evaluates the potential steps with the refreshed
  gradient (after the restricted/dense sweep) and redoes the reductions.

Scalars (λ0, n, ‖r‖², r'y, tol) ride in one lane-padded (1, 128)
VMEM row (SMEM vectors don't vmap on Mosaic; the lvocv batched tier
vmaps whole solves, so every operand must batch cleanly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_cd import (_gap_safe_core, _habs_reduce_core, _ls_candidate,
                       _stale_core_ls)

# whole-problem VMEM footprint: ~8 (nb, B) inputs + bound output + ~10
# elementwise intermediates live at once; stay conservative
_VMEM_BUDGET = 10 * 1024 * 1024


def fused_check_fits(nb: int, B: int) -> bool:
    """Static gate: the single-grid-step check kernel holds every (nb, B)
    operand in VMEM at once (p ≲ 130K at B=128; larger problems — e.g.
    the p=1M sharded axis — take the plain XLA check)."""
    return 20 * nb * B * 4 < _VMEM_BUDGET


def _phase_a_body(screen: bool):
    def body(scal_ref, c_ref, beta_ref, drift_ref, adiag_ref, lamw_ref,
             valid_ref, xwnorm_ref, need_out, ub_out, cand_out, bound_out,
             maxh_out, active_out):
        lam0 = scal_ref[0, 0]
        n_scale = scal_ref[0, 1]
        rn2 = scal_ref[0, 2]
        ry = scal_ref[0, 3]
        tol = scal_ref[0, 4]
        c = c_ref[:]
        beta = beta_ref[:]
        drift2 = drift_ref[:]
        adiag = adiag_ref[:]
        lamw = lamw_ref[:]
        valid = valid_ref[:] > 0
        xwnorm = xwnorm_ref[:]
        dt = c.dtype
        nb = c.shape[0]
        if screen:
            cand2 = _gap_safe_core(c, beta, drift2, adiag, lamw, valid,
                                   lam0, n_scale, rn2, ry)
        else:
            cand2 = jnp.ones((nb, 1), bool)
        certified2, bound, h_stale = _stale_core_ls(
            c, beta, drift2, adiag, lamw, valid, xwnorm, lam0, n_scale,
            tol)
        stale2 = drift2 > 0
        need2 = cand2 & stale2 & ~certified2
        ub2 = stale2 & certified2
        maxh, active2 = _habs_reduce_core(h_stale, bound, ub2, cand2,
                                          beta, xwnorm, rn2, tol)
        need_out[:] = need2.astype(dt)
        ub_out[:] = ub2.astype(dt)
        cand_out[:] = cand2.astype(dt)
        bound_out[:] = bound
        maxh_out[:] = jnp.reshape(maxh, (1, 1))
        active_out[:] = active2.astype(dt)

    return body


@functools.partial(jax.jit, static_argnames=("screen", "interpret"))
def check_phase_a(c, beta, drift2, adiag, lamw, validf, xwnorm, scal, *,
                  screen: bool, interpret: bool = False):
    """One-kernel no-refresh full check.  Returns
    ``(need, use_bound, cand, bound, maxh, active)`` with the masks as
    (nb, 1) float {0, 1} arrays and ``maxh`` a scalar."""
    nb, B = c.shape
    dt = c.dtype
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    col = jax.ShapeDtypeStruct((nb, 1), dt)
    outs = pl.pallas_call(
        _phase_a_body(screen),
        in_specs=[vm, vm, vm, vm, vm, vm, vm, vm],
        out_specs=[vm, vm, vm, vm, vm, vm],
        out_shape=[col, col, col, jax.ShapeDtypeStruct((nb, B), dt),
                   jax.ShapeDtypeStruct((1, 1), dt), col],
        interpret=interpret,
    )(scal, c, beta, drift2, adiag, lamw, validf, xwnorm)
    need, ub, cand, bound, maxh, active = outs
    return need, ub, cand, bound, maxh[0, 0], active


def _phase_b_body(scal_ref, c_ref, beta_ref, bound_ref, ub_ref, cand_ref,
                  adiag_ref, lamw_ref, valid_ref, xwnorm_ref, maxh_out,
                  active_out):
    lam0 = scal_ref[0, 0]
    n_scale = scal_ref[0, 1]
    rn2 = scal_ref[0, 2]
    tol = scal_ref[0, 4]
    c = c_ref[:]
    beta = beta_ref[:]
    valid = valid_ref[:] > 0
    xwnorm = xwnorm_ref[:]
    dt = c.dtype
    val = _ls_candidate(beta, c, adiag_ref[:], lam0, lamw_ref[:], n_scale)
    h = jnp.where(valid, val - beta, 0.0)
    maxh, active2 = _habs_reduce_core(h, bound_ref[:], ub_ref[:] > 0,
                                      cand_ref[:] > 0, beta, xwnorm, rn2,
                                      tol)
    maxh_out[:] = jnp.reshape(maxh, (1, 1))
    active_out[:] = active2.astype(dt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def check_phase_b(c_new, beta, bound, ubf, candf, adiag, lamw, validf,
                  xwnorm, scal, *, interpret: bool = False):
    """Post-refresh step re-evaluation + reductions in one kernel.
    Returns ``(maxh scalar, active (nb, 1) float)``."""
    nb, B = c_new.shape
    dt = c_new.dtype
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    maxh, active = pl.pallas_call(
        _phase_b_body,
        in_specs=[vm, vm, vm, vm, vm, vm, vm, vm, vm, vm],
        out_specs=[vm, vm],
        out_shape=[jax.ShapeDtypeStruct((1, 1), dt),
                   jax.ShapeDtypeStruct((nb, 1), dt)],
        interpret=interpret,
    )(scal, c_new, beta, bound, ubf, candf, adiag, lamw, validf, xwnorm)
    return maxh[0, 0], active

"""Observability: timing, convergence traces, roofline reporting, NaN mode.

The reference has no tracing, logging, or sanitizers (SURVEY.md §5.1-5.2,
§5.5) — only ad-hoc ``@time`` in benchmark scripts and the scalar ``maxH``
convergence check.  This module provides the TPU-native equivalents:

- ``simple_timeit``       — value-forced wall timing of a jitted fn
- ``trace``               — ``jax.profiler`` trace context for a code region
- ``solve_with_trace``    — epoch-instrumented Lasso solve returning the
  per-epoch convergence history (maxH, nnz, duality gap, objective) — the
  observability the reference lacks (coordinate_descent.jl:83-87 tracks
  only maxH, and only internally)
- ``pass_roofline``       — achieved HBM bandwidth of the fused Pallas pass
  vs the chip's peak (the north-star ≥70%-of-roofline report)
- ``debug_nans``          — context manager enabling JAX NaN checking
  (§5.2's sanitizer equivalent)
"""

from __future__ import annotations

import contextlib
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.block_cd import (
    _active_pass,
    _full_check,
    _init_state,
    _to_blocked_beta,
    build_blocked,
)
from ..ops.diagnostics import lasso_duality_gap
from ..utils.options import CDOptions

# spec-sheet peak HBM bandwidth per chip, bytes/s.  NOTE: a tunneled /
# virtualized device can deliver far less than spec (the axon v5e slice
# measures ~104 GB/s); ``measured_peak_hbm`` gives the honest denominator.
_PEAK_HBM = {
    "TPU v4": 1.2e12,
    "TPU v5e": 8.2e11,
    "TPU v5 lite": 8.2e11,
    "TPU v5p": 2.77e12,
    "TPU v6e": 1.64e12,
}


def measured_peak_hbm(nbytes: int = 2 << 30, dtype=jnp.float32) -> float:
    """Achieved bytes/s of a pure streaming reduction — the realistic
    roofline denominator on this device."""
    m = nbytes // np.dtype(dtype).itemsize
    x = jax.random.normal(jax.random.PRNGKey(0), (m,), dtype)
    f = jax.jit(lambda x, s: jnp.sum(x * s))
    sec = simple_timeit(f, x, jnp.asarray(1.5, dtype))
    return m * np.dtype(dtype).itemsize / sec


def _force(out):
    """Force completion by pulling a scalar reduction to the host.

    ``jax.block_until_ready`` does NOT reliably wait for device work on
    remote/tunneled backends (observed: 4 GB reductions "completing" in
    0.1 ms); materializing a host value is the only trustworthy sync.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "sum"):
            float(jnp.sum(leaf))


def simple_timeit(f, *args, tries: int = 5, warmup: int = 2) -> float:
    """Median wall seconds of ``f(*args)``, synced by materializing a host
    value from every output leaf (see ``_force``)."""
    for _ in range(warmup):
        _force(f(*args))
    times = []
    for _ in range(tries):
        t0 = time.perf_counter()
        _force(f(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(dirname: str):
    """``jax.profiler`` trace around a code region (view with TensorBoard
    or xprof)."""
    with jax.profiler.trace(dirname):
        yield


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable JAX NaN debugging for a region (SURVEY.md §5.2)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class EpochTrace(NamedTuple):
    """Per-epoch convergence history of an instrumented solve."""

    max_h: np.ndarray        # max coordinate displacement per epoch
    nnz: np.ndarray          # support size per epoch
    duality_gap: np.ndarray  # Fenchel gap per epoch (f64 on host)
    seconds: np.ndarray      # cumulative wall seconds


def solve_with_trace(X, y, lam, weights=None,
                     options: CDOptions = CDOptions(), *,
                     max_epochs: int = 200, seed: int = 0):
    """Lasso solve instrumented per epoch.

    Runs the same full-check / active-pass alternation as the engine
    (coordinate_descent.jl:65-92 semantics) but one epoch per jit call so
    the host can record (maxH, nnz, duality gap, time) after each — the
    metrics/observability subsystem the reference lacks (SURVEY.md §5.5).
    Returns ``(beta, EpochTrace)``.
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y, X.dtype)
    p = X.shape[1]
    lamw = (jnp.ones((p,), X.dtype) if weights is None
            else jnp.asarray(weights, X.dtype))
    lam = jnp.asarray(lam, X.dtype)
    n_scale = jnp.asarray(X.shape[0], X.dtype)

    @jax.jit
    def prep():
        prob = build_blocked("ls", options, lamw, X=X, y=y)
        st = _init_state("ls", prob,
                         _to_blocked_beta(jnp.zeros((p,), X.dtype),
                                          options.block_size),
                         jax.random.PRNGKey(seed))
        return prob, st

    @jax.jit
    def full_epoch(prob, st):
        st, maxh = _full_check("ls", prob, st, lam, n_scale,
                               options.opt_tol)
        return st, maxh

    @jax.jit
    def active_epoch(prob, st):
        st, maxh = _active_pass("ls", prob, st, lam, n_scale,
                                options.randomize, options)
        return st, maxh

    prob, st = prep()
    hs, nnzs, gaps, secs = [], [], [], []
    t0 = time.perf_counter()
    was_full = True
    converged_prev = False
    best, stall = float("inf"), 0
    f64 = jnp.dtype(X.dtype).itemsize >= 8
    for _ in range(max_epochs):
        st, maxh = (full_epoch if was_full else active_epoch)(prob, st)
        jax.block_until_ready(maxh)
        beta = st.beta.reshape(-1)[:p]
        hs.append(float(maxh))
        nnzs.append(int(jnp.sum(beta != 0)))
        gaps.append(float(lasso_duality_gap(X, y, beta, lam, lamw)))
        secs.append(time.perf_counter() - t0)
        # maxh from _full_check is already noise-floor-masked per
        # coordinate (block_cd.noise_floor_mask), matching the engine
        conv = float(maxh) < options.opt_tol
        if was_full and conv and converged_prev:
            break
        # mirror the engine's f32 stall detector exactly
        # (block_cd._solve_at_lambda_ws): full-check epochs only, reset on
        # ANY improvement of the certified maxh
        if was_full:
            stall = 0 if float(maxh) < best else stall + 1
            best = min(best, float(maxh))
        if not f64 and stall >= options.stall_patience:
            break
        converged_prev = conv
        was_full = conv
    return st.beta.reshape(-1)[:p], EpochTrace(
        np.asarray(hs), np.asarray(nnzs), np.asarray(gaps),
        np.asarray(secs))


class RooflineReport(NamedTuple):
    seconds_per_pass: float
    bytes_per_pass: int
    achieved_gbps: float
    peak_gbps: float            # spec sheet
    measured_peak_gbps: float   # pure-streaming measurement on this device
    fraction_of_roofline: float          # vs spec
    fraction_of_measured_peak: float     # vs what the device can do
    device_kind: str


def pass_roofline(n: int, p: int, *, block_size: int = 128,
                  dtype=jnp.float32, active_fraction: float = 1.0,
                  inner: str = "ista", seed: int = 0) -> RooflineReport:
    """Measure the fused active-pass kernel's achieved HBM bandwidth on a
    synthetic problem and report it against the chip's peak (the
    north-star roofline metric).

    Bandwidth accounting: the resident and chunked-with-retention variants
    read each active X block once (4·n·B bytes f32); the plain chunked
    fallback reads it twice.
    """
    from ..ops.pallas_block import (_resident_fits, _retention_fits,
                                    fused_active_pass)

    opts = CDOptions(block_size=block_size, randomize=False)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    X = jax.random.normal(k1, (n, p), dtype)
    y = jax.random.normal(k2, (n,), dtype)
    lamw = jnp.ones((p,), dtype)
    prob = build_blocked("ls", opts, lamw, X=X, y=y)
    nb, B = prob.lamw.shape
    n_act = max(1, int(round(active_fraction * nb)))
    beta_b = jnp.zeros((nb, B), dtype).at[:n_act, 0].set(1e-6)
    st = _init_state("ls", prob, beta_b, key)
    lam0 = jnp.asarray(0.0, dtype)
    nsc = jnp.asarray(float(n), dtype)
    border = jnp.arange(nb)
    corder = jnp.arange(B)

    # Per-pass time is measured as the SLOPE between 1 and 1+k chained
    # passes inside one jit call: a standalone call pays a one-time layout
    # conversion of the blocked design (~30ms for 60MB through the device
    # tunnel) that in-solver invocations never see, so absolute
    # single-call times wildly overstate the kernel cost.
    interp = jax.default_backend() != "tpu"

    def chained(k):
        @jax.jit
        def fn(prob, beta_b, r, active):
            for _ in range(k):
                beta_b, r, mh, _ = fused_active_pass(
                    prob, beta_b, r, active, lam0, nsc, border, corder,
                    kind="ls", inner=inner, interpret=interp)
            return beta_b, r
        return fn

    k = 16
    t1 = simple_timeit(chained(1), prob, st.beta, st.r, st.active)
    tk = simple_timeit(chained(1 + k), prob, st.beta, st.r, st.active)
    sec = max((tk - t1) / k, 1e-9)
    # resident AND chunked-with-retention variants read each active block
    # exactly once; only the plain chunked fallback pays the second read
    reads = (1 if (_resident_fits(n, B) or _retention_fits(n, B, nb, False))
             else 2)
    nbytes = reads * n_act * n * B * np.dtype(np.float32).itemsize
    kind = jax.devices()[0].device_kind
    peak = _PEAK_HBM.get(kind, 8.2e11)
    mpeak = measured_peak_hbm()
    achieved = nbytes / sec
    return RooflineReport(
        seconds_per_pass=sec,
        bytes_per_pass=int(nbytes),
        achieved_gbps=achieved / 1e9,
        peak_gbps=peak / 1e9,
        measured_peak_gbps=mpeak / 1e9,
        fraction_of_roofline=achieved / peak,
        fraction_of_measured_peak=achieved / mpeak,
        device_kind=kind,
    )

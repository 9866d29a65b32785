"""Pallas TPU kernels: one fused active-set block-CD pass.

This is the framework's native-tier hot loop (SURVEY.md §2 note, §7 M3) —
the TPU re-design of the reference's innermost sequence
(``_cdPass!`` → ``descendCoordinate!``, coordinate_descent.jl:94-110 /
cd_differentiable_function.jl:83-111).  The pure-XLA engine (block_cd.py)
dispatches per block: a Gram matmul, a B-step ``lax.scan``, and a residual
matvec — each a separate XLA op with dispatch/latency overhead.

Both kernels fuse the ENTIRE pass into one ``pallas_call``:

- grid major axis = the block-visit sequence; TPU grid steps execute
  sequentially on the core, so the residual ``r`` and coefficients ``β``
  live in VMEM for the whole pass (copied in at the first grid step,
  written back once at the end).
- the visit order is a scalar-prefetch array with the active blocks first;
  the ``X`` column block for step ``t`` is DMA'd HBM→VMEM by the BlockSpec
  pipeline using ``order[t]`` as the index.  Steps past ``n_active`` are
  predicated off and their pipeline indices clamped, so consecutive skipped
  steps re-use the resident buffer and spend no HBM bandwidth.
- per block: ``K = Xw'X`` and ``c = Xw'r`` on the MXU (HIGHEST precision),
  then the exact sequential Gauss-Seidel sweep over the block's coordinates
  via the Gram recursion ``c ← c − K[:,k]·h`` (the lifted form of the
  reference's rank-1 residual refresh), then a fused residual update
  ``r ← r − Δβ'X``.

Two variants, auto-selected by VMEM footprint:

- **resident** (small n): the whole ``(n, B)`` block sits in VMEM; each
  active block is read from HBM exactly once per pass — the speed-of-light
  HBM traffic for this algorithm.
- **chunked** (large n): 3D grid ``(block, phase, row-chunk)``; phase 0
  streams row chunks to accumulate ``K``/``c``, phase 1 re-streams them to
  apply the residual update (2 reads of each active block per pass, still
  ahead of the XLA path which reads them twice *and* pays per-op dispatch).
- **chunked + retention** (large n that still leaves room for ONE whole
  ``(n, B)`` block in VMEM): phase 0 additionally copies each streamed
  chunk into a persistent VMEM scratch, and phase 1 replays the block from
  that scratch — its pipeline index is clamped to the last phase-0 chunk so
  it issues NO new HBM traffic.  One X read per active block per pass (the
  resident variant's speed-of-light traffic) at chunked-variant VMEM cost:
  this is what removes the 2× read penalty at the benchmark shape
  (n = 10K, B = 128, where the resident variant is ~3× over budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = lax.Precision.HIGHEST

# conservative per-core VMEM budget (v5e/v4 have ~16 MiB usable); the
# resident variant's footprint is ~6× the X-block size (2-3 pipeline
# buffers + Mosaic transpose scratch for the two non-native dot layouts)
_VMEM_BUDGET = 11 * 1024 * 1024
_ROW_CHUNK = 1024


def _resident_fits(n: int, B: int, weighted: bool = False) -> bool:
    # weighted problems pipeline BOTH Xb and Xwb blocks → 2× the footprint
    factor = 2 if weighted else 1
    return factor * 6 * n * B * 4 < _VMEM_BUDGET - 1024 * 1024


def _chunked_state_bytes(n: int, B: int, nb: int, weighted: bool) -> tuple:
    """(state, chunk) byte footprints of the chunked kernel."""
    factor = 2 if weighted else 1
    state = 3 * nb * B * 4 + 2 * 4 * -(-n // _ROW_CHUNK) * _ROW_CHUNK
    chunk = factor * 6 * _ROW_CHUNK * B * 4
    return state, chunk


def _retention_fits(n: int, B: int, nb: int, weighted: bool) -> bool:
    """Whether the chunked kernel can afford the extra persistent (n, B)
    VMEM scratch that lets phase 1 replay the block without re-reading HBM
    (phase 1 needs only the unweighted X, so one scratch even for wls)."""
    state, chunk = _chunked_state_bytes(n, B, nb, weighted)
    keep = -(-n // _ROW_CHUNK) * _ROW_CHUNK * B * 4
    return state + chunk + keep < _VMEM_BUDGET


def pallas_pass_fits(n: int, B: int, nb: int, weighted: bool) -> bool:
    """Static check that some variant fits the VMEM budget."""
    if _resident_fits(n, B, weighted):
        return True
    state, chunk = _chunked_state_bytes(n, B, nb, weighted)
    return state + chunk < _VMEM_BUDGET


def _soft(x, t):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def _block_scan(corder_ref, K_ref, c, beta0, lamw, lam0, nsc, B,
                kind="ls", rsqr0=None):
    """Exact sequential CD over one block's coordinates via the Gram
    recursion (shared by both kernel variants).  For ``kind="sqrt"`` the
    running ``‖r‖²`` is threaded through the exact three-branch
    closed-form minimizer (cd_differentiable_function.jl:242-291).
    Returns ``(beta1, c, maxh, rsqr1)``."""
    dt = c.dtype
    iota = lax.broadcasted_iota(jnp.int32, (1, B), 1)
    eye = lax.broadcasted_iota(jnp.int32, (B, B), 0) == \
        lax.broadcasted_iota(jnp.int32, (B, B), 1)
    adiag = jnp.sum(jnp.where(eye, K_ref[:], 0.0), axis=0,
                    keepdims=True)                    # (1, B)
    if rsqr0 is None:
        rsqr0 = jnp.zeros((), dt)

    def body(i, carry):
        beta_row, c, mh, rsqr = carry
        k = corder_ref[i]
        onehot = (iota == k).astype(dt)
        a = jnp.sum(adiag * onehot)
        bk = jnp.sum(beta_row * onehot)
        ck = jnp.sum(c * onehot)
        lw = jnp.sum(lamw * onehot)
        safe = a > 0.0
        asafe = jnp.where(safe, a, 1.0)
        if kind == "sqrt":
            # exact sqrt-lasso minimizer with the coordinate's own
            # contribution added back (cd_differentiable_function.jl:242-291)
            sv = ck + a * bk
            rsb = jnp.maximum(rsqr + 2.0 * bk * ck + bk * bk * a, 0.0)
            lam = lam0 * lw
            ok = safe & (lam * lam < a)
            den = jnp.sqrt(jnp.where(ok, 1.0 - lam * lam / asafe, 1.0))
            inner = jnp.sqrt(jnp.maximum(rsb - sv * sv / asafe, 0.0))
            mag = (jnp.abs(sv) - lam / den * inner) / asafe
            nonzero = ok & (jnp.abs(sv) > lam * jnp.sqrt(rsb))
            val = jnp.where(nonzero, jnp.sign(sv) * mag, 0.0)
            val = jnp.where(safe, val, bk)
            rsqr = jnp.maximum(rsb - 2.0 * val * sv + val * val * a, 0.0)
        else:
            # exact LS coordinate minimizer
            # (cd_differentiable_function.jl:101-103)
            val = _soft(bk + ck / asafe, nsc * lam0 * lw / asafe)
            val = jnp.where(safe, val, bk)
        h = val - bk
        # Gram recursion: remaining gradients shift by K[:,k]·h (:107-109)
        c = c - K_ref[pl.ds(k, 1), :] * h
        beta_row = beta_row + onehot * h
        return beta_row, c, jnp.maximum(mh, jnp.abs(h)), rsqr

    return lax.fori_loop(0, B, body, (beta0, c, jnp.zeros((), dt), rsqr0))


def _block_ista(K_ref, c, beta0, lamw, thr_scale, B, iters: int):
    """Vectorized inexact block solve: ``iters`` ISTA steps on the block's
    (weighted) LS + L1 subproblem with per-coordinate thresholds
    ``thr_scale·λw`` (``thr_scale = n·λ0`` for ls/wls; ``λ0·‖r₀‖`` for the
    sqrt-lasso MM majorization ``‖r‖ ≤ (‖r‖² + ‖r₀‖²)/(2‖r₀‖)`` — each
    block visit then approximately minimizes a convex majorizer of the
    true objective; with the FISTA acceleration below individual visits
    are only near-monotone, and final convergence is certified by the
    outer KKT sweep as always).

    Sequential scalar CD costs ~B dependent steps per block; on the VPU each
    step is μs-scale, dominating the whole pass.  ISTA replaces them with
    ``iters`` MXU matvecs: with ``L ≥ λmax(K)`` (Gershgorin row-sum bound),
    ``d ← soft(d + (c + K(β0 − d))/L; n·λ0·λw/L)`` decreases the block
    objective monotonically and has the same fixed points as exact
    coordinate descent, so the outer loop's KKT certificate
    (block_cd._full_check) guarantees the same converged solution — only
    the trajectory differs, which the reference's own config-invariance
    tests treat as equivalent (SURVEY.md §4.3).  Returns ``(d, maxh)``.
    """
    dt = c.dtype
    K = K_ref[:]
    L = jnp.max(jnp.sum(jnp.abs(K), axis=0, keepdims=True))  # ≥ λmax(K)
    L = jnp.maximum(L, 1e-30)
    thr = thr_scale * lamw / L                               # (1, B)
    Kb0 = lax.dot_general(beta0, K, (((1,), (0,)), ((), ())),
                          preferred_element_type=dt, precision=_PREC)
    q0 = c + Kb0

    # FISTA (Nesterov momentum) at identical per-iteration cost; the
    # momentum sequence is the standard t_{k+1} = (1+√(1+4t_k²))/2.  The
    # block subproblem is convex, so the accelerated iterates approach the
    # block optimum 2-3× faster than plain ISTA for the same matvec budget.
    def body(_, carry):
        d, d_prev, t = carry
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        yv = d + ((t - 1.0) / t_next) * (d - d_prev)
        Ky = lax.dot_general(yv, K, (((1,), (0,)), ((), ())),
                             preferred_element_type=dt, precision=_PREC)
        d_new = _soft(yv + (q0 - Ky) / L, thr)
        return d_new, d, t_next

    d, _, _ = lax.fori_loop(
        0, iters, body, (beta0, beta0, jnp.ones((), dt)))
    # zero-snap epilogue: a finite ISTA budget leaves tiny nonzero "dust"
    # on coordinates whose exact solo-optimum is 0 (the prox zeroes them
    # only at convergence).  The exact coordinate-wise zero condition
    # given the others fixed is |a_k·d_k + q_k| ≤ thr_scale·λw_k
    # (cd_differentiable_function.jl:101-103 rearranged); snapping those
    # to exact 0 reduces the L1 term by thr·Σ|dust| against an O(dust²)
    # quadratic change, keeps the active set honest, and preserves the
    # solver's exact-sparsity semantics.
    q = q0 - lax.dot_general(d, K, (((1,), (0,)), ((), ())),
                             preferred_element_type=dt, precision=_PREC)
    eye = lax.broadcasted_iota(jnp.int32, (B, B), 0) == \
        lax.broadcasted_iota(jnp.int32, (B, B), 1)
    adiag = jnp.sum(jnp.where(eye, K, 0.0), axis=0, keepdims=True)
    solo_zero = jnp.abs(adiag * d + q) <= thr_scale * lamw
    d = jnp.where(solo_zero, 0.0, d)
    # dead columns (zero curvature, e.g. padding) must not move
    alive = adiag > 0.0
    d = jnp.where(alive, d, beta0)
    return d, jnp.max(jnp.abs(d - beta0))


# ---------------------------------------------------------------------------
# Variant 1: whole block resident in VMEM (small/medium n)
# ---------------------------------------------------------------------------


def _make_resident_kernel(B: int, kind: str, inner: str, iters: int,
                          gram: bool):
    weighted = kind == "wls"

    def kernel(order_ref, na_ref, corder_ref, *refs):
        if gram:
            # cached-Gram tile pipelined alongside the X block (64 KB vs
            # the 2·n·B² MXU FLOPs it replaces — see CDOptions.cache_gram)
            x_refs, (K_ref, *refs) = refs[:2 if weighted else 1], \
                refs[2 if weighted else 1:]
            refs = tuple(x_refs) + tuple(refs)
        else:
            K_ref = None
        if weighted:
            (Xb_ref, Xwb_ref, lamw_ref, lam_ref, nsc_ref, rsqr_in, beta_in,
             r_in, beta_out, r_out, maxh_ref, rsqr_out, K_s) = refs
        else:
            (Xb_ref, lamw_ref, lam_ref, nsc_ref, rsqr_in, beta_in,
             r_in, beta_out, r_out, maxh_ref, rsqr_out, K_s) = refs
            Xwb_ref = Xb_ref

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            beta_out[:] = beta_in[:]
            r_out[:] = r_in[:]
            maxh_ref[0, 0] = jnp.zeros((), maxh_ref.dtype)
            rsqr_out[0, 0] = rsqr_in[0, 0]

        @pl.when(t < na_ref[0])
        def _():
            ob = order_ref[t]
            X = Xb_ref[0]                             # (n, B)
            Xw = Xwb_ref[0]
            r = r_out[:]                              # (1, n)
            dt = X.dtype
            if gram:
                K_s[:] = K_ref[0]
            else:
                K_s[:] = lax.dot_general(
                    Xw, X, (((0,), (0,)), ((), ())),
                    preferred_element_type=dt, precision=_PREC)
            c = lax.dot_general(
                r, Xw, (((1,), (0,)), ((), ())),
                preferred_element_type=dt, precision=_PREC)
            beta0 = beta_out[pl.ds(ob, 1), :]         # (1, B)
            lamw = lamw_ref[pl.ds(ob, 1), :]
            if inner == "ista":
                if kind == "sqrt":
                    # MM majorizer threshold λ0·‖r₀‖ at the current block
                    ts = lam_ref[0, 0] * jnp.sqrt(
                        jnp.maximum(rsqr_out[0, 0], 1e-30))
                else:
                    ts = nsc_ref[0, 0] * lam_ref[0, 0]
                beta1, mh = _block_ista(K_s, c, beta0, lamw, ts, B, iters)
                rs1 = rsqr_out[0, 0]
            else:
                beta1, _, mh, rs1 = _block_scan(
                    corder_ref, K_s, c, beta0, lamw, lam_ref[0, 0],
                    nsc_ref[0, 0], B, kind, rsqr_out[0, 0])
            dvec = beta1 - beta0                      # (1, B)
            r_new = r - lax.dot_general(
                dvec, X, (((1,), (1,)), ((), ())),
                preferred_element_type=dt, precision=_PREC)
            r_out[:] = r_new
            beta_out[pl.ds(ob, 1), :] = beta1
            maxh_ref[0, 0] = jnp.maximum(maxh_ref[0, 0], mh)
            if kind == "sqrt" and inner == "ista":
                # exact ‖r‖² refresh for the next block's majorizer
                rsqr_out[0, 0] = jnp.sum(r_new * r_new)
            else:
                rsqr_out[0, 0] = rs1

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n", "B", "nb", "kind", "inner", "iters",
                              "interpret"))
def _resident_pass(Xb, Xwb, Kb, lamw, beta_b, r, rsqr, order, n_active,
                   corder, lam0, n_scale, *, n, B, nb, kind, inner, iters,
                   interpret):
    weighted = kind == "wls"
    gram = Kb is not None
    kernel = _make_resident_kernel(B, kind, inner, iters, gram)
    x_spec = pl.BlockSpec(
        (1, n, B), lambda t, order_ref, na_ref, co_ref: (order_ref[t], 0, 0),
        memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(
        (1, B, B), lambda t, order_ref, na_ref, co_ref: (order_ref[t], 0, 0),
        memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_in = [Xb] + ([Xwb] if weighted else []) + ([Kb] if gram else [])
    in_specs = ([x_spec] * (2 if weighted else 1)
                + ([k_spec] if gram else [])
                + [vm, sm, sm, sm, vm, vm])
    # DYNAMIC grid: exactly the active steps run (plus one clamped step when
    # the active set is empty, so the t==0 state init still executes).
    # Per-grid-step overhead is what bounds these kernels in-loop — a full
    # static grid would pay for every inactive block even when predicated.
    gsize = jnp.maximum(n_active[0], 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gsize,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((B, B), beta_b.dtype)],
    )
    beta_out, r_out, maxh, rsqr_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(beta_b.shape, beta_b.dtype),
            jax.ShapeDtypeStruct(r.shape, r.dtype),
            jax.ShapeDtypeStruct((1, 1), beta_b.dtype),
            jax.ShapeDtypeStruct((1, 1), beta_b.dtype),
        ],
        # NOTE: no input_output_aliases — the t==0 branch copies β/r
        # in→out (always executes: the dynamic grid is clamped ≥ 1), and
        # jax 0.9.0 mis-shifts alias indices for dynamic-grid pallas_calls
        # inside the vmap explicit-loop batching fallback (IndexError in
        # _pallas_call_abstract_eval).  Costs one extra β/r VMEM buffer.
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n * B * (B + 2),
            bytes_accessed=nb * n * B * 4 + 2 * n * 4 + 3 * nb * B * 4,
            transcendentals=0,
        ),
    )(order, n_active, corder, *data_in,
      lamw, lam0.reshape(1, 1), n_scale.reshape(1, 1), rsqr.reshape(1, 1),
      beta_b, r)
    return beta_out, r_out, maxh[0, 0], rsqr_out[0, 0]


# ---------------------------------------------------------------------------
# Variant 2: row-chunked streaming (large n)
# ---------------------------------------------------------------------------


def _make_chunked_kernel(B: int, R: int, n: int, nr: int, kind: str,
                         inner: str, iters: int, retain: bool, gram: bool):
    weighted = kind == "wls"

    def kernel(order_ref, na_ref, corder_ref, *refs):
        if retain:
            *refs, Xk_s = refs
        else:
            Xk_s = None
        if gram:
            x_refs, (K_ref, *rest) = refs[:2 if weighted else 1], \
                refs[2 if weighted else 1:]
            refs = tuple(x_refs) + tuple(rest)
        else:
            K_ref = None
        if weighted:
            (Xb_ref, Xwb_ref, lamw_ref, lam_ref, nsc_ref, rsqr_in, beta_in,
             r_in, beta_out, r_out, maxh_ref, rsqr_out, K_s, c_s, d_s) = refs
        else:
            (Xb_ref, lamw_ref, lam_ref, nsc_ref, rsqr_in, beta_in,
             r_in, beta_out, r_out, maxh_ref, rsqr_out, K_s, c_s, d_s) = refs
            Xwb_ref = Xb_ref

        t = pl.program_id(0)
        phase = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when((t == 0) & (phase == 0) & (j == 0))
        def _():
            beta_out[:] = beta_in[:]
            r_out[:] = r_in[:]
            maxh_ref[0, 0] = jnp.zeros((), maxh_ref.dtype)
            rsqr_out[0, 0] = rsqr_in[0, 0]

        @pl.when(t < na_ref[0])
        def _():
            ob = order_ref[t]
            dt = r_out.dtype
            # mask rows past the true n (the tail chunk is padded by the
            # BlockSpec pipeline with unspecified values)
            rowmask = (lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                       + j * R) < n
            if retain:
                # phase 0 banks the streamed (masked) chunk in the
                # persistent scratch; phase 1 replays it from VMEM — its
                # pipeline index is clamped (see xmap), so the block is
                # read from HBM exactly once per visit
                X = jnp.where(phase == 0,
                              jnp.where(rowmask, Xb_ref[0], 0.0),
                              Xk_s[pl.ds(j * R, R), :])
            else:
                X = jnp.where(rowmask, Xb_ref[0], 0.0)    # (R, B)
            rc = r_out[:, pl.ds(j * R, R)]            # (1, R)

            @pl.when(phase == 0)
            def _():
                if retain:
                    Xk_s[pl.ds(j * R, R), :] = X
                Xw = jnp.where(rowmask, Xwb_ref[0], 0.0) if weighted else X

                @pl.when(j == 0)
                def _():
                    if gram:
                        K_s[:] = K_ref[0]
                    else:
                        K_s[:] = jnp.zeros_like(K_s)
                    c_s[:] = jnp.zeros_like(c_s)

                if not gram:
                    K_s[:] += lax.dot_general(
                        Xw, X, (((0,), (0,)), ((), ())),
                        preferred_element_type=dt, precision=_PREC)
                c_s[:] += lax.dot_general(
                    rc, Xw, (((1,), (0,)), ((), ())),
                    preferred_element_type=dt, precision=_PREC)

                @pl.when(j == nr - 1)
                def _():
                    beta0 = beta_out[pl.ds(ob, 1), :]
                    lamw = lamw_ref[pl.ds(ob, 1), :]
                    if inner == "ista":
                        if kind == "sqrt":
                            ts = lam_ref[0, 0] * jnp.sqrt(
                                jnp.maximum(rsqr_out[0, 0], 1e-30))
                        else:
                            ts = nsc_ref[0, 0] * lam_ref[0, 0]
                        beta1, mh = _block_ista(
                            K_s, c_s[:], beta0, lamw, ts, B, iters)
                        rs1 = rsqr_out[0, 0]
                    else:
                        beta1, _, mh, rs1 = _block_scan(
                            corder_ref, K_s, c_s[:], beta0, lamw,
                            lam_ref[0, 0], nsc_ref[0, 0], B, kind,
                            rsqr_out[0, 0])
                    d_s[:] = beta1 - beta0
                    beta_out[pl.ds(ob, 1), :] = beta1
                    maxh_ref[0, 0] = jnp.maximum(maxh_ref[0, 0], mh)
                    rsqr_out[0, 0] = rs1

            @pl.when(phase == 1)
            def _():
                rc_new = rc - lax.dot_general(
                    d_s[:], X, (((1,), (1,)), ((), ())),
                    preferred_element_type=dt, precision=_PREC)
                r_out[:, pl.ds(j * R, R)] = rc_new
                if kind == "sqrt" and inner == "ista":
                    # rebuild ‖r‖² chunk-by-chunk for the next block
                    @pl.when(j == 0)
                    def _():
                        rsqr_out[0, 0] = jnp.zeros((), rsqr_out.dtype)
                    rsqr_out[0, 0] += jnp.sum(rc_new * rc_new)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n", "B", "nb", "R", "kind", "inner", "iters",
                              "retain", "interpret"))
def _chunked_pass(Xb, Xwb, Kb, lamw, beta_b, r_pad, rsqr, order, n_active,
                  corder, lam0, n_scale, *, n, B, nb, R, kind, inner, iters,
                  retain, interpret):
    weighted = kind == "wls"
    gram = Kb is not None
    nr = -(-n // R)
    kernel = _make_chunked_kernel(B, R, n, nr, kind, inner, iters, retain,
                                  gram)

    def xmap(t, ph, j, order_ref, na_ref, co_ref):
        # clamp skipped steps to chunk 0 of the last active block so the
        # pipeline re-uses the resident buffer; with retention, phase 1 is
        # additionally clamped to the last phase-0 chunk (same block) so it
        # issues no HBM traffic at all — the kernel replays from scratch
        jj = jnp.where(t < na_ref[0], j, 0)
        if retain:
            jj = jnp.where(ph == 0, jj, jnp.where(t < na_ref[0], nr - 1, 0))
        return (order_ref[t], jj, 0)

    x_spec = pl.BlockSpec((1, R, B), xmap, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(
        (1, B, B), lambda t, ph, j, order_ref, na_ref, co_ref:
        (order_ref[t], 0, 0), memory_space=pltpu.VMEM)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    data_in = [Xb] + ([Xwb] if weighted else []) + ([Kb] if gram else [])
    in_specs = ([x_spec] * (2 if weighted else 1)
                + ([k_spec] if gram else [])
                + [vm, sm, sm, sm, vm, vm])
    dt = beta_b.dtype
    # dynamic major grid dim: only the active blocks generate grid steps
    gsize = jnp.maximum(n_active[0], 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gsize, 2, nr),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, B), dt),
            pltpu.VMEM((1, B), dt),
            pltpu.VMEM((1, B), dt),
        ] + ([pltpu.VMEM((nr * R, B), dt)] if retain else []),
    )
    x_reads = 1 if retain else 2
    beta_out, r_out, maxh, rsqr_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(beta_b.shape, dt),
            jax.ShapeDtypeStruct(r_pad.shape, r_pad.dtype),
            jax.ShapeDtypeStruct((1, 1), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ],
        # no input_output_aliases — see _resident_pass for why
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n * B * (B + 2),
            bytes_accessed=(x_reads * nb * n * B * 4 + 2 * n * 4
                            + 3 * nb * B * 4),
            transcendentals=0,
        ),
    )(order, n_active, corder, *data_in,
      lamw, lam0.reshape(1, 1), n_scale.reshape(1, 1), rsqr.reshape(1, 1),
      beta_b, r_pad)
    return beta_out, r_out, maxh[0, 0], rsqr_out[0, 0]


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def _prefetch_order(active, border):
    """Scalar-prefetch visit order for the fused pass: the active blocks
    first — in ``border`` (possibly permuted) order — then the skipped tail
    clamped to the LAST active block, so consecutive equal pipeline indices
    re-use the resident buffer and skipped steps spend no HBM bandwidth.

    This is the TPU lifting of the reference's ordered / random / sparse
    iterators (atom_iterator.jl:11-85) to block granularity; its semantics
    are pinned directly by tests/test_iterators.py.  Returns
    ``(order, n_active)``."""
    nb = border.shape[0]
    keep = active[border]
    # stable partition: active blocks first, preserving the visit order
    idx = jnp.argsort(~keep, stable=True)
    order = border[idx].astype(jnp.int32)
    n_active = jnp.sum(keep).astype(jnp.int32)
    last = order[jnp.maximum(n_active - 1, 0)]
    tpos = jnp.arange(nb, dtype=jnp.int32)
    return jnp.where(tpos < n_active, order, last), n_active


def fused_active_pass(prob, beta_b, r, active, lam0, n_scale, border,
                      corder, *, kind: str = "ls", rsqr=None,
                      inner: str = "exact", iters: int = 16,
                      interpret: bool = False):
    """Run one fused active-set pass.  ``border``/``corder`` are the block /
    within-block visit orders (permuted when randomizing).  Returns
    ``(beta_b, r, maxh, rsqr)`` with the same semantics as the XLA
    ``_active_pass`` for the ls/wls/sqrt kinds (``rsqr`` is the running
    ``‖r‖²``, used only by sqrt)."""
    nb, B = prob.lamw.shape
    n = prob.y.shape[0]
    order, n_active = _prefetch_order(active, border)

    dt = beta_b.dtype
    if rsqr is None:
        rsqr = jnp.zeros((), dt)
    args = (prob.Xb, prob.Xwb, prob.Kb, prob.lamw, beta_b)
    scalars = (order, n_active.reshape(1), corder.astype(jnp.int32),
               jnp.asarray(lam0, dt), jnp.asarray(n_scale, dt))
    if _resident_fits(n, B, weighted=(kind == "wls")):
        beta2, r_row, maxh, rsqr2 = _resident_pass(
            *args, r.reshape(1, n), jnp.asarray(rsqr, dt), *scalars,
            n=n, B=B, nb=nb, kind=kind, inner=inner, iters=iters,
            interpret=interpret)
        return beta2, r_row.reshape(n), maxh, rsqr2

    R = _ROW_CHUNK
    nr = -(-n // R)
    r_pad = jnp.pad(r, (0, nr * R - n)).reshape(1, nr * R)
    beta2, r_row, maxh, rsqr2 = _chunked_pass(
        *args, r_pad, jnp.asarray(rsqr, dt), *scalars,
        n=n, B=B, nb=nb, R=R, kind=kind, inner=inner, iters=iters,
        retain=_retention_fits(n, B, nb, weighted=(kind == "wls")),
        interpret=interpret)
    return beta2, r_row.reshape(-1)[:n], maxh, rsqr2


# ---------------------------------------------------------------------------
# Fused full-gradient sweep (the KKT check's c = Xw'r for every block)
# ---------------------------------------------------------------------------


def _make_sweep_kernel(B: int, R: int, n: int, nr: int):
    def kernel(Xwb_ref, r_ref, c_out, c_s):
        t = pl.program_id(0)
        j = pl.program_id(1)
        dt = c_out.dtype
        rowmask = (lax.broadcasted_iota(jnp.int32, (R, 1), 0) + j * R) < n
        Xw = jnp.where(rowmask, Xwb_ref[0], 0.0)      # (R, B)
        rc = r_ref[:, pl.ds(j * R, R)]                # (1, R)

        @pl.when(j == 0)
        def _():
            c_s[:] = jnp.zeros_like(c_s)

        c_s[:] += lax.dot_general(
            rc, Xw, (((1,), (0,)), ((), ())),
            preferred_element_type=dt, precision=_PREC)

        @pl.when(j == nr - 1)
        def _():
            c_out[pl.ds(t, 1), :] = c_s[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n", "B", "nb", "R", "interpret"))
def _sweep_pass(Xwb, r_pad, *, n, B, nb, R, interpret):
    nr = -(-n // R)
    kernel = _make_sweep_kernel(B, R, n, nr)
    return pl.pallas_call(
        kernel,
        grid=(nb, nr),
        in_specs=[
            pl.BlockSpec((1, R, B), lambda t, j: (t, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B), Xwb.dtype),
        scratch_shapes=[pltpu.VMEM((1, B), Xwb.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n * B,
            bytes_accessed=nb * n * B * 4 + n * 4 + nb * B * 4,
            transcendentals=0,
        ),
    )(Xwb, r_pad)


def fused_gradient_sweep(Xwb, r, *, interpret: bool = False):
    """Blocked full gradient ``c[b] = Xw_b' r`` for every block in one
    streaming kernel — the O(n·p) read of the KKT full check
    (block_cd._full_gradient_c).  XLA lowers the equivalent batched-GEMV
    einsum at ~15% of HBM roofline on TPU; this kernel streams X once at
    pipeline speed."""
    nb, n, B = Xwb.shape
    # R must be lane-aligned (the r slice offset j·R needs a static
    # multiple-of-128 proof in Mosaic); _ROW_CHUNK is 8·128
    R = _ROW_CHUNK
    nr = -(-n // R)
    r_pad = jnp.pad(r, (0, nr * R - n)).reshape(1, nr * R)
    return _sweep_pass(Xwb, r_pad, n=n, B=B, nb=nb, R=R,
                       interpret=interpret)


# ---------------------------------------------------------------------------
# Restricted gradient sweep: refresh c only for the needed blocks
# ---------------------------------------------------------------------------


def _make_rsweep_kernel(B: int, R: int, n: int, nr: int):
    def kernel(order_ref, nn_ref, Xwb_ref, r_ref, c_out, c_s):
        t = pl.program_id(0)
        j = pl.program_id(1)

        # rows of c_out for skipped blocks stay unwritten (garbage); the
        # wrapper merges them back to the cached entries with jnp.where —
        # in/out aliasing would avoid that copy but trips a JAX indexing
        # inconsistency with scalar prefetch + dynamic grids (jax 0.9.0)
        @pl.when(t < nn_ref[0])
        def _():
            ob = order_ref[t]
            dt = c_out.dtype
            rowmask = (lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                       + j * R) < n
            Xw = jnp.where(rowmask, Xwb_ref[0], 0.0)
            rc = r_ref[:, pl.ds(j * R, R)]

            @pl.when(j == 0)
            def _():
                c_s[:] = jnp.zeros_like(c_s)

            c_s[:] += lax.dot_general(
                rc, Xw, (((1,), (0,)), ((), ())),
                preferred_element_type=dt, precision=_PREC)

            @pl.when(j == nr - 1)
            def _():
                c_out[pl.ds(ob, 1), :] = c_s[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n", "B", "nb", "R", "interpret"))
def _rsweep_pass(Xwb, r_pad, order, n_need, *, n, B, nb, R, interpret):
    nr = -(-n // R)
    kernel = _make_rsweep_kernel(B, R, n, nr)

    def xmap(t, j, order_ref, nn_ref):
        jj = jnp.where(t < nn_ref[0], j, 0)
        return (order_ref[t], jj, 0)

    gsize = jnp.maximum(n_need[0], 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(gsize, nr),
        in_specs=[
            pl.BlockSpec((1, R, B), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, B), Xwb.dtype)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, B), Xwb.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * n * B,
            bytes_accessed=nb * n * B * 4 + n * 4 + nb * B * 4,
            transcendentals=0,
        ),
    )(order, n_need, Xwb, r_pad)


def restricted_gradient_sweep(Xwb, r, need, c_prev, *,
                              interpret: bool = False):
    """Refresh ``c[b] = Xw_b' r`` for blocks with ``need[b]``; other blocks
    keep their ``c_prev`` entries.  The needed blocks are ordered first via
    scalar prefetch and the skipped tail is clamped to the last needed
    block, so only ``sum(need)`` blocks of X generate HBM traffic — this is
    what makes gap-safe-screened KKT checks cheap (block_cd._full_check)."""
    nb, n, B = Xwb.shape
    idx = jnp.argsort(~need, stable=True).astype(jnp.int32)
    n_need = jnp.sum(need).astype(jnp.int32)
    last = idx[jnp.maximum(n_need - 1, 0)]
    tpos = jnp.arange(nb, dtype=jnp.int32)
    order = jnp.where(tpos < n_need, idx, last)
    R = _ROW_CHUNK
    nr = -(-n // R)
    r_pad = jnp.pad(r, (0, nr * R - n)).reshape(1, nr * R)
    swept = _rsweep_pass(Xwb, r_pad, order, n_need.reshape(1),
                         n=n, B=B, nb=nb, R=R, interpret=interpret)
    return jnp.where(need[:, None], swept, c_prev)

"""Shared machinery for every batched certify/refine execution mode.

The batched λ-path (``models/lasso_path._lasso_path_batched_core``), its
feature-sharded twin (``parallel/sharded_cd._make_sharded_path_batched``),
the batched z-grid (``models/varying_coefficient._locpolyl1_batched_core``)
and the batched LOO-CV (``_lvocv_locpolyl1_one_h_batched``) all follow the
same pattern: solve many related problem instances ("lanes") in lockstep,
certify all lanes with ONE shared order-independent KKT sweep per X read
(the reference certifies each solve separately with its own sweep,
``/root/reference/src/coordinate_descent.jl:83-110``), and refine only the
uncertified lanes.  The pieces below are the lane-level primitives those
drivers share; keeping them here avoids coupling the model modules to each
other's internals.

Escape accounting: ``stall_escape_update`` threads a per-lane ``escaped``
mask through the refinement loop so every batched driver can report how
many lanes were accepted via the near-tol stall escape rather than the
strict ``mx < tol`` rule (the bench records these counts next to the
certified flags; f64 runs must always report 0 — the escape is gated on
``patience``, which callers set to INT32_MAX for f64).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..utils.options import CDOptions


def kkt_violation_lanes(B, R, thrw, X, adiag, xnorm):
    """Per-lane KKT violation magnitudes |prox-step| for a batch of
    iterates against (a column block of) ``X`` — the order-independent
    certify sweep of the batched path execution, shared by the
    single-device and feature-sharded drivers.  ``B``/``thrw`` are
    ``(k, p_cols)``, ``R`` ``(k, n)``; returns noise-floor-masked ``H``
    of shape ``(k, p_cols)``."""
    from .block_cd import _PREC, noise_floor_mask

    dt = B.dtype
    Cg = jnp.dot(R, X, precision=_PREC)
    # the prox step |soft(B + c/a, t) − B| computed literally cancels at
    # scale |B| (~4 ulps of a large coefficient exceeds an f32 tol=1e-6);
    # algebraically B cancels EXACTLY on the un-thresholded branch:
    # h = c/a − t·sign(z) — a cancellation at scale t ≈ |c/a| instead
    g = Cg / adiag[None]
    t = thrw / adiag[None]
    zv = B + g
    H = jnp.abs(jnp.where(jnp.abs(zv) > t, g - t * jnp.sign(zv), -B))
    if jnp.dtype(dt).itemsize < 8:
        eps = jnp.finfo(dt).eps
        rnorm = jnp.sqrt(jnp.einsum("kn,kn->k", R, R, precision=_PREC))
        return noise_floor_mask(
            H, B, 4 * eps * rnorm[:, None] / xnorm[None, :])
    return noise_floor_mask(H, B)


def union_priority(B, H, cert, hi):
    """Two-tier union-working-set priority per column: support
    coordinates of uncertified lanes strictly above violations, ranked
    by |B| within the support tier and by H within the violation tier.
    ``hi`` must be ``2·max(H over uncertified) + 1`` over ALL columns
    (globally reduced by the sharded caller) — a finfo.max tier offset
    would absorb the ranks in floating point and degenerate top_k to
    index order."""
    Habs = jnp.where(cert[:, None], 0.0, H)
    Bmag = jnp.max(jnp.where(cert[:, None], 0.0, jnp.abs(B)), axis=0)
    anynz = jnp.any((B != 0) & ~cert[:, None], axis=0)
    return jnp.where(anynz, hi * (1.0 + Bmag / (1.0 + Bmag)),
                     jnp.max(Habs, axis=0))


def union_block_fista(Ks, thr_full, Bs0, cs0, cert, opts: CDOptions,
                      n_sweeps: int = 8):
    """Cyclic block-FISTA refinement over a gathered union working set:
    ``block_size``-wide blocks of the union Gram ``Ks`` with per-block
    Gershgorin majorizers (the proven ``block_cd._visit_block`` scheme; a
    single whole-union majorizer is ~C/√n too loose and never certifies)
    and cross-block gradient maintenance.  Gram-sized — the sharded
    driver runs it replicated on every shard.  ``Bs0``/``cs0`` are
    ``(k, Cp)`` lane coefficients and gradients ``Xs'R``; certified lanes
    (``cert``) are frozen.  Returns the refined ``bs``."""
    from .block_cd import _PREC
    from .prox import soft_threshold

    dt = Bs0.dtype
    Cp = Ks.shape[0]
    Bb = int(opts.block_size)
    ncb = Cp // Bb
    Kd = Ks.reshape(ncb, Bb, ncb, Bb)
    Kdiag = Kd[jnp.arange(ncb), :, jnp.arange(ncb), :]    # (ncb, Bb, Bb)
    Lb = jnp.maximum(jnp.max(jnp.sum(jnp.abs(Kdiag), axis=2), axis=1),
                     jnp.asarray(1e-30, dt))              # (ncb,)

    def sweep(carry, _):
        bs, cs = carry              # (k, Cp) coeffs; cs = Xs'R(bs)

        def blk(carry2, b):
            bs, cs = carry2
            o = b * Bb
            bs_b = lax.dynamic_slice_in_dim(bs, o, Bb, 1)
            cs_b = lax.dynamic_slice_in_dim(cs, o, Bb, 1)
            thr_b = lax.dynamic_slice_in_dim(thr_full, o, Bb, 1)
            Kbb = Kdiag[b]
            L = Lb[b]

            def fista(c3, _):
                z, v, t = c3
                gv = cs_b - jnp.dot(v - bs_b, Kbb, precision=_PREC)
                z_new = soft_threshold(v + gv / L, thr_b / L)
                t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
                v_new = z_new + ((t - 1.0) / t_new) * (z_new - z)
                return (z_new, v_new, t_new), None

            (b_new, _, _), _ = lax.scan(
                fista, (bs_b, bs_b, jnp.ones((), dt)), None,
                length=opts.block_iters)
            b_new = jnp.where(cert[:, None], bs_b, b_new)
            d = b_new - bs_b
            # cross-block gradient maintenance: cs -= d·Ks[rows b]
            Krows = lax.dynamic_slice_in_dim(Ks, o, Bb, 0)
            cs = cs - jnp.dot(d, Krows, precision=_PREC)
            bs = lax.dynamic_update_slice_in_dim(bs, b_new, o, 1)
            return (bs, cs), None

        return lax.scan(blk, (bs, cs), jnp.arange(ncb))[0], None

    # several cyclic sweeps per certify: sweeps are Gram-sized (cheap);
    # the certify GEMM is the O(n·p) X read to amortize
    (bs, _), _ = lax.scan(sweep, (Bs0, cs0), None, length=n_sweeps)
    return bs


def stall_escape_update(cert, best, stall, escaped, mx, patience, tol,
                        frozen=None):
    """Per-lane f32 stall escape shared by EVERY batched certify/refine
    loop (λ-path single-device + sharded, locpolyl1 z-grid, batched
    LOO-CV).  f32 lanes can limit-cycle a hair above ``tol`` — the scan
    path exits such points via its stall detector, so the batched
    certify holds itself to the same bar, not a stricter one.  The
    escape accepts only NEAR-TOL finite plateaus (the f32 limit cycle
    sits within ~2·tol): a lane stuck far from optimality — saturated
    union support, FISTA divergence on an underestimated Lipschitz
    bound, NaN — must stay uncertified so the documented scan fallback
    fires.  ``mx`` is the per-lane certificate max this round; returns
    the updated ``(cert, best, stall, escaped)`` where ``escaped``
    accumulates the lanes certified via the escape rather than the
    strict rule (surfaced as ``*_stall_escaped_lanes`` in the bench)."""
    improved = mx < best
    stall = jnp.where(cert, stall, jnp.where(improved, 0, stall + 1))
    best = jnp.minimum(best, mx)
    stall_ok = (stall >= patience) & (mx < 4 * tol) & jnp.isfinite(mx)
    strict = mx < tol
    escaped = escaped | (~cert & stall_ok & ~strict)
    cert = cert | strict | stall_ok
    if frozen is not None:
        cert = cert | frozen
    return cert, best, stall, escaped


def run_chunked_segments(lam_path, chunk: int, run_segment):
    """Host-driven segment loop shared by every λ-path ``scan_chunk``
    driver (single-device, feature-sharded, row/tile-sharded) — single
    source for the chunking mechanics so the drivers cannot diverge:
    pad the last segment by repeating the final λ (one compiled program
    serves every segment), stop issuing segments once the carry's stop
    flag is set (later points are in-trace no-ops anyway), slice off pad
    outputs, and mark never-issued points invalid.

    ``run_segment(s, seg, carry)`` runs segment ``s`` over the λ slice
    ``seg`` from ``carry`` (``None`` for the first segment) and returns
    ``(betas_seg, valids_seg, carry_out)``; ``carry_out[-1]`` must be
    the scan's stop flag.  Returns ``(betas (g, …), valids (g,))``.
    """
    g = int(lam_path.shape[0])
    nseg = -(-g // chunk)
    pad = nseg * chunk - g
    if pad:
        lam_path = jnp.concatenate(
            [lam_path, jnp.repeat(lam_path[-1:], pad)])
    parts_b, parts_v = [], []
    carry = None
    for s in range(nseg):
        seg = lam_path[s * chunk:(s + 1) * chunk]
        b, v, carry = run_segment(s, seg, carry)
        parts_b.append(b)
        parts_v.append(v)
        if bool(carry[-1]):
            break
    betas = jnp.concatenate(parts_b, axis=0)[:g]
    valids = jnp.concatenate(parts_v, axis=0)[:g]
    done = betas.shape[0]
    if done < g:  # early-exited segments: later points are invalid
        valids = jnp.concatenate(
            [valids, jnp.zeros((g - done,), valids.dtype)])
        betas = jnp.concatenate(
            [betas, jnp.zeros((g - done,) + betas.shape[1:],
                              betas.dtype)])
    return betas, valids

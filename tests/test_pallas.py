"""Pallas fused-pass kernel vs pure-XLA engine equivalence.

SURVEY.md §4 "TPU test mapping" (c): the fused kernel (ops/pallas_block.py)
must reproduce the XLA block engine exactly.  On the CPU test platform the
kernel runs in interpreter mode (``use_pallas=True`` forces it off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coordinatedescent_jl_tpu as cd
from coordinatedescent_jl_tpu.ops.block_cd import (
    _active_pass,
    _init_state,
    build_blocked,
)
from coordinatedescent_jl_tpu.ops.pallas_block import fused_active_pass


def _gen(n, p, s, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    beta[:s] = rng.standard_normal(s)
    y = X @ beta + 0.3 * rng.standard_normal(n)
    return jnp.asarray(X), jnp.asarray(y)


def test_fused_pass_matches_xla_pass():
    rng = np.random.default_rng(3)
    n, p, B = 96, 70, 16
    X, y = _gen(n, p, 8, seed=3)
    opts = cd.CDOptions(block_size=B, randomize=False)
    lamw = jnp.asarray(0.5 + rng.random(p))
    prob = build_blocked("ls", opts, lamw, X=X, y=y)
    nb = prob.lamw.shape[0]
    beta_b = jnp.asarray(
        rng.standard_normal((nb, B)) * (rng.random((nb, B)) < 0.3))
    beta_b = beta_b * prob.valid
    beta_b = beta_b.at[1].set(0.0)  # one fully-inactive block
    st = _init_state("ls", prob, beta_b, jax.random.PRNGKey(0))
    lam0 = jnp.asarray(0.05)
    nsc = jnp.asarray(float(n))

    st2, maxh2 = _active_pass("ls", prob, st, lam0, nsc, randomize=False)
    b3, r3, mh3, _ = fused_active_pass(
        prob, st.beta, st.r, st.active, lam0, nsc,
        jnp.arange(nb), jnp.arange(B), kind="ls", interpret=True)
    np.testing.assert_allclose(b3, st2.beta, atol=1e-12)
    np.testing.assert_allclose(r3, st2.r, atol=1e-12)
    np.testing.assert_allclose(float(mh3), float(maxh2), atol=1e-12)


def test_fused_pass_weighted():
    rng = np.random.default_rng(7)
    n, p, B = 80, 48, 16
    X, y = _gen(n, p, 6, seed=7)
    w = jnp.asarray(0.2 + rng.random(n))
    opts = cd.CDOptions(block_size=B, randomize=False)
    lamw = jnp.ones((p,))
    prob = build_blocked("wls", opts, lamw, X=X, y=y, w=w)
    nb = prob.lamw.shape[0]
    beta_b = jnp.asarray(
        rng.standard_normal((nb, B)) * (rng.random((nb, B)) < 0.4))
    beta_b = beta_b * prob.valid
    st = _init_state("wls", prob, beta_b, jax.random.PRNGKey(0))
    lam0 = jnp.asarray(0.03)
    nsc = jnp.asarray(float(n))

    st2, maxh2 = _active_pass("wls", prob, st, lam0, nsc, randomize=False)
    b3, r3, mh3, _ = fused_active_pass(
        prob, st.beta, st.r, st.active, lam0, nsc,
        jnp.arange(nb), jnp.arange(B), kind="wls", interpret=True)
    np.testing.assert_allclose(b3, st2.beta, atol=1e-12)
    np.testing.assert_allclose(r3, st2.r, atol=1e-12)
    np.testing.assert_allclose(float(mh3), float(maxh2), atol=1e-12)


def test_lasso_solve_with_forced_pallas_matches():
    X, y = _gen(120, 90, 10, seed=11)
    lam = 0.1
    o_xla = cd.CDOptions(block_size=16, use_pallas=False)
    o_pl = cd.CDOptions(block_size=16, use_pallas=True)
    s1 = cd.lasso(X, y, lam, options=o_xla)
    s2 = cd.lasso(X, y, lam, options=o_pl)
    np.testing.assert_allclose(s2.x, s1.x, atol=1e-10)
    np.testing.assert_allclose(s2.residuals, s1.residuals, atol=1e-10)


def test_weighted_lasso_solve_with_forced_pallas_matches():
    rng = np.random.default_rng(13)
    X, y = _gen(100, 64, 8, seed=13)
    w = jnp.asarray(0.2 + rng.random(100))
    loss = cd.WeightedLSLoss(y, X, w)
    g = cd.ProxL1(0.05)
    b1, r1 = cd.coordinate_descent(
        jnp.zeros(64), loss, g, cd.CDOptions(block_size=16,
                                             use_pallas=False))
    b2, r2 = cd.coordinate_descent(
        jnp.zeros(64), loss, g, cd.CDOptions(block_size=16,
                                             use_pallas=True))
    np.testing.assert_allclose(b2, b1, atol=1e-10)


def test_fused_pass_sqrt():
    rng = np.random.default_rng(17)
    n, p, B = 90, 48, 16
    X, y = _gen(n, p, 6, seed=17)
    opts = cd.CDOptions(block_size=B, randomize=False)
    lamw = jnp.ones((p,))
    prob = build_blocked("sqrt", opts, lamw, X=X, y=y)
    nb = prob.lamw.shape[0]
    beta_b = jnp.asarray(
        rng.standard_normal((nb, B)) * (rng.random((nb, B)) < 0.3))
    beta_b = beta_b * prob.valid
    st = _init_state("sqrt", prob, beta_b, jax.random.PRNGKey(0))
    lam0 = jnp.asarray(0.05)
    nsc = jnp.asarray(float(n))

    st2, maxh2 = _active_pass("sqrt", prob, st, lam0, nsc, randomize=False)
    b3, r3, mh3, rs3 = fused_active_pass(
        prob, st.beta, st.r, st.active, lam0, nsc,
        jnp.arange(nb), jnp.arange(B), kind="sqrt", rsqr=st.rsqr,
        interpret=True)
    np.testing.assert_allclose(b3, st2.beta, atol=1e-12)
    np.testing.assert_allclose(r3, st2.r, atol=1e-12)
    np.testing.assert_allclose(float(rs3), float(st2.rsqr), rtol=1e-12)


def test_sqrt_lasso_solve_with_forced_pallas_matches():
    X, y = _gen(100, 64, 8, seed=19)
    lam = 0.3 / np.sqrt(100)
    s1 = cd.sqrt_lasso(X, y, lam, standardize_X=False,
                       options=cd.CDOptions(block_size=16, use_pallas=False))
    s2 = cd.sqrt_lasso(X, y, lam, standardize_X=False,
                       options=cd.CDOptions(block_size=16, use_pallas=True))
    np.testing.assert_allclose(s2.x, s1.x, atol=1e-8)


def test_ista_inner_reaches_same_solution():
    # inexact vectorized block solves must converge to the same KKT point
    X, y = _gen(120, 90, 10, seed=23)
    lam = 0.1
    s_exact = cd.lasso(X, y, lam,
                       options=cd.CDOptions(block_size=16, use_pallas=True,
                                            inner="exact"))
    s_ista = cd.lasso(X, y, lam,
                      options=cd.CDOptions(block_size=16, use_pallas=True,
                                           inner="ista", block_iters=16))
    np.testing.assert_allclose(s_ista.x, s_exact.x, atol=1e-5)
    gap = cd.lasso_duality_gap(X, y, s_ista.x, lam)
    assert float(gap) < 1e-6


def test_sqrt_ista_inner_reaches_same_solution():
    # the MM-majorized ISTA inner for sqrt-lasso must reach the same
    # KKT point as the exact three-branch scan
    X, y = _gen(110, 72, 8, seed=29)
    lam = 1.1 * np.sqrt(2 * np.log(72) / 110)
    s_exact = cd.sqrt_lasso(X, y, lam, standardize_X=False,
                            options=cd.CDOptions(block_size=16,
                                                 use_pallas=True,
                                                 inner="exact"))
    s_ista = cd.sqrt_lasso(X, y, lam, standardize_X=False,
                           options=cd.CDOptions(block_size=16,
                                                use_pallas=True,
                                                inner="ista",
                                                block_iters=24))
    np.testing.assert_allclose(s_ista.x, s_exact.x, atol=1e-5)


def test_fused_gradient_sweep_matches_einsum():
    from coordinatedescent_jl_tpu.ops.pallas_block import (
        fused_gradient_sweep,
    )
    from coordinatedescent_jl_tpu.ops.block_cd import (
        _full_gradient_c,
        build_blocked,
    )

    rng = np.random.default_rng(31)
    n, p, B = 100, 70, 16   # n not a multiple of the row chunk
    X = jnp.asarray(rng.standard_normal((n, p)))
    y = jnp.asarray(rng.standard_normal(n))
    r = jnp.asarray(rng.standard_normal(n))
    opts = cd.CDOptions(block_size=B)
    prob = build_blocked("ls", opts, jnp.ones((p,)), X=X, y=y)
    ref = _full_gradient_c("ls", prob, r)
    out = fused_gradient_sweep(prob.Xwb, r, interpret=True)
    np.testing.assert_allclose(out, ref, atol=1e-10)


@pytest.mark.parametrize("gram", [False, True])
@pytest.mark.parametrize("retain", [False, True])
@pytest.mark.parametrize("kind", ["ls", "wls", "sqrt"])
def test_chunked_pass_matches_xla(kind, retain, gram):
    """Chunked streaming variant (with and without the phase-1 VMEM
    retention that removes the second HBM read) vs the XLA pass, forced
    via a small row chunk so nr > 1 and the tail chunk is ragged."""
    from coordinatedescent_jl_tpu.ops.pallas_block import _chunked_pass

    rng = np.random.default_rng(41)
    n, p, B, R = 90, 64, 16, 32          # nr = 3, last chunk ragged
    X, y = _gen(n, p, 7, seed=41)
    w = jnp.asarray(0.2 + rng.random(n))
    opts = cd.CDOptions(block_size=B, randomize=False)
    lamw = jnp.asarray(0.5 + rng.random(p))
    kw = {"X": X, "y": y}
    if kind == "wls":
        kw["w"] = w
    prob = build_blocked(kind, opts, lamw, **kw)
    if not gram:
        prob = prob._replace(Kb=None)
    nb = prob.lamw.shape[0]
    beta_b = jnp.asarray(
        rng.standard_normal((nb, B)) * (rng.random((nb, B)) < 0.3))
    beta_b = (beta_b * prob.valid).at[2].set(0.0)
    st = _init_state(kind, prob, beta_b, jax.random.PRNGKey(0))
    lam0 = jnp.asarray(0.05)
    nsc = jnp.asarray(float(n))

    st2, maxh2 = _active_pass(kind, prob, st, lam0, nsc, randomize=False)

    from coordinatedescent_jl_tpu.ops.pallas_block import _prefetch_order
    order, n_active = _prefetch_order(st.active, jnp.arange(nb))
    nr = -(-n // R)
    r_pad = jnp.pad(st.r, (0, nr * R - n)).reshape(1, nr * R)
    b3, r3, mh3, rs3 = _chunked_pass(
        prob.Xb, prob.Xwb, prob.Kb, prob.lamw, st.beta, r_pad, st.rsqr,
        order, n_active.reshape(1), jnp.arange(B, dtype=jnp.int32),
        lam0, nsc, n=n, B=B, nb=nb, R=R, kind=kind, inner="exact",
        iters=16, retain=retain, interpret=True)
    np.testing.assert_allclose(b3, st2.beta, atol=1e-12)
    np.testing.assert_allclose(r3.reshape(-1)[:n], st2.r, atol=1e-12)
    np.testing.assert_allclose(float(mh3), float(maxh2), atol=1e-12)
    if kind == "sqrt":
        np.testing.assert_allclose(float(rs3), float(st2.rsqr), rtol=1e-10)

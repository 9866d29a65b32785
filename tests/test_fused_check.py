"""Fused Pallas full-check (ops/pallas_check.py) vs plain XLA check.

The fused check is an f32/TPU fast path (gated off for the f64 oracle
suite); here it runs in interpreter mode (``use_pallas=True`` off-TPU)
against explicitly f32 problems and must reproduce the plain path's
decisions and values — both paths call the same raw-array cores, so any
divergence is a wiring bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coordinatedescent_jl_tpu as cd
from coordinatedescent_jl_tpu.ops.block_cd import (
    _active_pass,
    _full_check,
    _init_state,
    build_blocked,
)


def _gen_f32(n, p, s, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p)).astype(np.float32)
    beta = np.zeros(p, np.float32)
    beta[:s] = rng.standard_normal(s)
    y = (X @ beta + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


@pytest.mark.parametrize("screen", [True, False])
def test_fused_solve_matches_plain_f32(screen):
    X, y = _gen_f32(300, 600, 10, seed=0)
    lam = 0.15
    s_plain = cd.lasso(X, y, lam,
                       options=cd.CDOptions(use_pallas=False, screen=screen))
    s_fused = cd.lasso(X, y, lam,
                       options=cd.CDOptions(use_pallas=True, screen=screen))
    np.testing.assert_allclose(np.asarray(s_fused.x), np.asarray(s_plain.x),
                               atol=5e-6)
    assert (np.asarray(s_fused.x) != 0).sum() == \
        (np.asarray(s_plain.x) != 0).sum()


def test_fused_weighted_solve_matches_plain_f32():
    rng = np.random.default_rng(5)
    X, y = _gen_f32(200, 320, 8, seed=5)
    w = jnp.asarray(0.2 + rng.random(200), jnp.float32)
    loss = cd.WeightedLSLoss(y, X, w)
    g = cd.ProxL1(jnp.float32(0.12))
    b0 = jnp.zeros(320, jnp.float32)
    b_plain, _ = cd.coordinate_descent(
        b0, loss, g, cd.CDOptions(use_pallas=False))
    b_fused, _ = cd.coordinate_descent(
        b0, loss, g, cd.CDOptions(use_pallas=True))
    np.testing.assert_allclose(np.asarray(b_fused), np.asarray(b_plain),
                               atol=5e-6)


def test_fused_path_matches_plain_f32():
    X, y = _gen_f32(250, 500, 8, seed=2)
    lams = jnp.asarray(np.geomspace(0.5, 0.05, 12), jnp.float32)
    p_plain = cd.lasso_path(X, y, lams,
                            options=cd.CDOptions(use_pallas=False))
    p_fused = cd.lasso_path(X, y, lams,
                            options=cd.CDOptions(use_pallas=True))
    np.testing.assert_allclose(np.asarray(p_fused.beta_path),
                               np.asarray(p_plain.beta_path), atol=1e-5)


def test_fused_full_check_state_parity():
    """Direct _full_check comparison on a mid-solve state with stale
    gradient caches: need/drift/c/active decisions and maxh must agree
    between the fused-kernel (interpret) and plain executions."""
    rng = np.random.default_rng(9)
    n, p, B = 160, 320, 32
    X, y = _gen_f32(n, p, 6, seed=9)
    o_plain = cd.CDOptions(block_size=B, use_pallas=False, randomize=False)
    o_fused = cd.CDOptions(block_size=B, use_pallas=True, randomize=False)
    lamw = jnp.ones(p, jnp.float32)
    prob = build_blocked("ls", o_plain, lamw, X=X, y=y)
    nb = prob.lamw.shape[0]
    beta_b = jnp.asarray(
        (rng.standard_normal((nb, B)) * (rng.random((nb, B)) < 0.2))
        .astype(np.float32)) * prob.valid
    st = _init_state("ls", prob, beta_b, jax.random.PRNGKey(0))
    lam0 = jnp.asarray(0.08, jnp.float32)
    nsc = jnp.asarray(float(n), jnp.float32)

    # a couple of active passes accumulate genuine drift on the cache
    st, _ = _active_pass("ls", prob, st, lam0, nsc, randomize=False,
                         opts=o_plain)
    st, _ = _active_pass("ls", prob, st, lam0, nsc, randomize=False,
                         opts=o_plain)
    assert float(jnp.max(st.drift)) > 0

    s_pl, mh_pl = _full_check("ls", prob, st, lam0, nsc, 1e-7, o_plain)
    s_fu, mh_fu = _full_check("ls", prob, st, lam0, nsc, 1e-7, o_fused)
    np.testing.assert_allclose(float(mh_fu), float(mh_pl), rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(s_fu.active),
                                  np.asarray(s_pl.active))
    np.testing.assert_array_equal(np.asarray(s_fu.drift),
                                  np.asarray(s_pl.drift))
    np.testing.assert_allclose(np.asarray(s_fu.c), np.asarray(s_pl.c),
                               atol=1e-5)

    # converged-state variant: no block needs a refresh → the one-kernel
    # no-refresh branch (phase A only)
    sol = cd.lasso(X, y, 0.08, options=o_plain)
    st2 = _init_state("ls", prob, s_pl.beta, jax.random.PRNGKey(1))
    s_pl2, mh_pl2 = _full_check("ls", prob, st2, lam0, nsc, 1e-7, o_plain)
    s_fu2, mh_fu2 = _full_check("ls", prob, st2, lam0, nsc, 1e-7, o_fused)
    np.testing.assert_allclose(float(mh_fu2), float(mh_pl2), rtol=1e-6,
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(s_fu2.active),
                                  np.asarray(s_pl2.active))


def test_fused_gate_stays_off_for_f64():
    """The f64 oracle suite must keep the exact plain check: the fused
    path is statically gated on f32."""
    X, y = _gen_f32(100, 60, 4, seed=1)
    X64, y64 = X.astype(jnp.float64), y.astype(jnp.float64)
    s_pl = cd.lasso(X64, y64, 0.1,
                    options=cd.CDOptions(use_pallas=False, inner="exact"))
    s_fu = cd.lasso(X64, y64, 0.1,
                    options=cd.CDOptions(use_pallas=True, inner="exact"))
    np.testing.assert_allclose(np.asarray(s_fu.x), np.asarray(s_pl.x),
                               atol=1e-12)

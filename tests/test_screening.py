"""Gap-safe screening tests.

Screening must be *exact*: solutions with ``screen=True`` equal solutions
with ``screen=False`` (it only skips coordinates provably zero at the
optimum).  Also pins the restricted-sweep kernel semantics and checks the
rule actually fires (candidate set ≪ p near convergence) while never
discarding a support coordinate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import coordinatedescent_jl_tpu as cd
from coordinatedescent_jl_tpu.ops.block_cd import (
    _gap_safe_candidates,
    _init_state,
    _to_blocked_beta,
    build_blocked,
)


def _gen(n, p, s, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, p))
    beta = np.zeros(p)
    sup = rng.choice(p, s, replace=False)
    beta[sup] = rng.standard_normal(s) + np.sign(rng.standard_normal(s))
    y = X @ beta + noise * rng.standard_normal(n)
    return jnp.asarray(X), jnp.asarray(y), sup


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("weighted", [False, True])
def test_screening_is_exact(seed, weighted):
    X, y, _ = _gen(200, 96, 8, seed=seed)
    p = X.shape[1]
    w = None
    if weighted:
        rng = np.random.default_rng(seed + 10)
        w = jnp.asarray(0.5 + np.abs(rng.standard_normal(p)))
    base = cd.CDOptions(block_size=16, randomize=False)
    s_on = cd.lasso(X, y, 0.1, weights=w, options=base.replace(screen=True))
    s_off = cd.lasso(X, y, 0.1, weights=w,
                     options=base.replace(screen=False))
    np.testing.assert_allclose(s_on.x, s_off.x, atol=1e-9)


def test_screening_exact_on_cold_path(seed=3):
    X, y, _ = _gen(150, 64, 6, seed=seed)
    lams = np.exp(np.linspace(np.log(0.5), np.log(0.03), 8))
    base = cd.CDOptions(block_size=16)
    p_on = cd.lasso_path(X, y, lams, options=base.replace(screen=True),
                         standardize_X=True)
    p_off = cd.lasso_path(X, y, lams, options=base.replace(screen=False),
                          standardize_X=True)
    np.testing.assert_allclose(p_on.beta_path, p_off.beta_path, atol=1e-9)


def test_screening_exact_cold_start():
    X, y, _ = _gen(120, 80, 5, seed=4)
    base = cd.CDOptions(block_size=16, warm_start=False, num_steps=20)
    s_on = cd.lasso(X, y, 0.08, options=base.replace(screen=True))
    s_off = cd.lasso(X, y, 0.08, options=base.replace(screen=False))
    np.testing.assert_allclose(s_on.x, s_off.x, atol=1e-9)


def test_candidates_small_but_cover_support():
    """Near the optimum the safe sphere is tight: most blocks screen out,
    and no block containing a nonzero optimal coordinate is screened."""
    X, y, _ = _gen(300, 256, 6, seed=5)
    B = 16
    opts = cd.CDOptions(block_size=B, randomize=False)
    lam = 0.15
    sol = cd.lasso(X, y, lam, options=opts)
    beta = np.asarray(sol.x)
    prob = build_blocked("ls", opts, jnp.ones((X.shape[1],), X.dtype),
                         X=X, y=y)
    st = _init_state("ls", prob, _to_blocked_beta(sol.x, B),
                     jax.random.PRNGKey(0))
    # exact cached gradient (drift = 0), as after a confirming sweep
    c = jnp.einsum("bnk,n->bk", prob.Xwb, st.r)
    st = st._replace(c=c, drift=jnp.zeros_like(st.drift))
    n_scale = jnp.asarray(float(X.shape[0]), X.dtype)
    rn2 = st.r @ st.r
    cand = np.asarray(_gap_safe_candidates(prob, st, jnp.asarray(lam),
                                           n_scale, rn2))
    sup_blocks = np.unique(np.nonzero(beta)[0] // B)
    assert all(cand[b] for b in sup_blocks), "support block screened!"
    assert cand.sum() < 0.5 * cand.shape[0], (
        f"screening too weak: {cand.sum()}/{cand.shape[0]} candidates")


def test_candidates_conservative_with_stale_cache():
    """With a large drift bound the rule must keep everything."""
    X, y, _ = _gen(100, 64, 4, seed=6)
    B = 16
    opts = cd.CDOptions(block_size=B)
    prob = build_blocked("ls", opts, jnp.ones((X.shape[1],), X.dtype),
                         X=X, y=y)
    st = _init_state("ls", prob, _to_blocked_beta(
        jnp.zeros((X.shape[1],), X.dtype), B), jax.random.PRNGKey(0))
    n_scale = jnp.asarray(float(X.shape[0]), X.dtype)
    rn2 = st.r @ st.r
    cand = np.asarray(_gap_safe_candidates(prob, st, jnp.asarray(0.1),
                                           n_scale, rn2))
    assert cand.all()


def test_restricted_sweep_interpret_matches_reference():
    from coordinatedescent_jl_tpu.ops.pallas_block import (
        restricted_gradient_sweep,
    )

    rng = np.random.default_rng(7)
    nb, n, B = 6, 50, 8
    Xwb = jnp.asarray(rng.standard_normal((nb, n, B)), jnp.float32)
    r = jnp.asarray(rng.standard_normal(n), jnp.float32)
    c_prev = jnp.asarray(rng.standard_normal((nb, B)), jnp.float32)
    need = jnp.asarray([True, False, True, True, False, False])
    out = restricted_gradient_sweep(Xwb, r, need, c_prev, interpret=True)
    want = np.where(np.asarray(need)[:, None],
                    np.einsum("bnk,n->bk", np.asarray(Xwb), np.asarray(r)),
                    np.asarray(c_prev))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
    # nothing needed → pure passthrough
    none = jnp.zeros((nb,), bool)
    out2 = restricted_gradient_sweep(Xwb, r, none, c_prev, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(c_prev))


def test_screening_exact_scaled_lasso():
    """The σ outer loop re-screens at every round's effective λ."""
    X, y, _ = _gen(150, 64, 5, seed=8)
    lam = float(np.sqrt(2 * np.log(64) / 150))
    base = cd.CDOptions(block_size=16)
    o_on = cd.IterLassoOptions(options_cd=base.replace(screen=True))
    o_off = cd.IterLassoOptions(options_cd=base.replace(screen=False))
    s_on = cd.scaled_lasso(X, y, lam, options=o_on)
    s_off = cd.scaled_lasso(X, y, lam, options=o_off)
    np.testing.assert_allclose(s_on.x, s_off.x, atol=1e-9)
    np.testing.assert_allclose(float(s_on.sigma), float(s_off.sigma),
                               atol=1e-10)

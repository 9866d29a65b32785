"""Drift-ball certification tests (block_cd._stale_certified).

The full KKT check may accept a block on a conservative stale-gradient
bound instead of refreshing its gradient from X.  Soundness requirement:
whenever a block is certified, the *exact* potential steps of every one of
its coordinates are < tol — so the convergence / reactivation decisions are
identical to an exact refresh, only the X traffic differs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import coordinatedescent_jl_tpu as cd
from coordinatedescent_jl_tpu.ops.block_cd import (
    CDState,
    _full_gradient_c,
    _init_state,
    _potential_steps,
    _stale_certified,
    _to_blocked_beta,
    build_blocked,
)


def _mk(kind, n=120, p=64, seed=0, B=16):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, p)))
    y = jnp.asarray(X @ (rng.standard_normal(p) * (rng.random(p) < 0.2))
                    + 0.3 * rng.standard_normal(n))
    w = jnp.asarray(0.2 + rng.random(n)) if kind == "wls" else None
    opts = cd.CDOptions(block_size=B)
    prob = build_blocked(kind, opts, jnp.ones((p,)),
                         X=X, y=y, w=w)
    return prob, X, y, rng


@pytest.mark.parametrize("kind", ["ls", "wls", "sqrt"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_certified_blocks_truly_converged(kind, seed):
    """For a stale cached gradient with an honest drift bound, every
    certified block's exact potential steps must be below tol."""
    prob, X, y, rng = _mk(kind, seed=seed)
    n, p = X.shape
    B = 16
    # a plausible near-solution beta (solve loosely, then perturb r a bit)
    lam0 = 0.25
    sol = cd.lasso(X, y, lam0) if kind != "sqrt" else cd.sqrt_lasso(
        X, y, 1.1 * np.sqrt(2 * np.log(p) / n))
    beta_b = _to_blocked_beta(jnp.asarray(sol.x), B)
    st = _init_state(kind, prob, beta_b, jax.random.PRNGKey(0))
    # stale snapshot: gradient at r_ref, then move r by a known delta
    c_ref = _full_gradient_c(kind, prob, st.r)
    delta = jnp.asarray(0.01 * rng.standard_normal(n))
    r_new = st.r + delta
    drift = jnp.full((beta_b.shape[0],), float(jnp.linalg.norm(delta)))
    rsqr = r_new @ r_new
    st = st._replace(r=r_new, rsqr=rsqr, c=c_ref, drift=drift)

    n_scale = jnp.asarray(float(n))
    for tol in (1e-1, 1e-2, 1e-3, 1e-4):
        certified, bound = _stale_certified(kind, prob, st, rsqr,
                                            jnp.asarray(lam0), n_scale, tol)
        # exact steps at the TRUE current residual
        c_exact = _full_gradient_c(kind, prob, r_new)
        h_exact = _potential_steps(kind, prob, st.beta, c_exact, rsqr,
                                   jnp.asarray(lam0), n_scale)
        h_exact = np.abs(np.asarray(jnp.where(prob.valid, h_exact, 0.0)))
        cert = np.asarray(certified)
        if cert.any():
            assert h_exact[cert].max() < tol
        # and the reported bound dominates the exact step wherever finite
        b = np.asarray(bound)
        ok = ~cert[:, None] | ~np.isfinite(b) | (h_exact <= b + 1e-12)
        assert ok.all()


def test_certification_fires_near_convergence():
    """After convergence at λ, a small residual perturbation must leave most
    blocks certified (otherwise the optimization never engages)."""
    prob, X, y, rng = _mk("ls", n=200, p=256, seed=5)
    n, p = X.shape
    lam0 = 0.3
    sol = cd.lasso(X, y, lam0, options=cd.CDOptions(block_size=16))
    beta_b = _to_blocked_beta(jnp.asarray(sol.x), 16)
    st = _init_state("ls", prob, beta_b, jax.random.PRNGKey(0))
    c_ref = _full_gradient_c("ls", prob, st.r)
    delta = jnp.asarray(1e-7 * rng.standard_normal(n))
    st = st._replace(r=st.r + delta, c=c_ref,
                     drift=jnp.full((beta_b.shape[0],),
                                    float(jnp.linalg.norm(delta))))
    certified, _ = _stale_certified("ls", prob, st, st.rsqr,
                                    jnp.asarray(lam0),
                                    jnp.asarray(float(n)), 1e-6)
    frac = float(jnp.mean(certified))
    assert frac > 0.9, f"only {frac:.2%} of blocks certified"


@pytest.mark.parametrize("kind", ["ls", "wls", "sqrt"])
def test_solutions_unchanged_by_certification_path(kind):
    """End-to-end: warm-started re-solves (which exercise the certified
    check on every confirming sweep) match a cold solve to solver tol."""
    prob, X, y, rng = _mk(kind, n=150, p=96, seed=7)
    n, p = X.shape
    lam = 0.2 if kind != "sqrt" else 1.1 * np.sqrt(2 * np.log(p) / n)
    opts = cd.CDOptions(block_size=16, opt_tol=1e-9)
    f = (cd.lasso if kind == "ls" else
         (lambda X, y, l, options: cd.lasso(
             X, y, l, weights=None, options=options)) if kind == "wls"
         else cd.sqrt_lasso)
    if kind == "wls":
        w = jnp.asarray(0.2 + rng.random(n))
        loss = cd.WeightedLSLoss(y=y, X=X, w=w)
        pen = cd.ProxL1(lam)
        b1, _ = cd.coordinate_descent(jnp.zeros((p,)), loss, pen, opts)
        # warm re-solve from the solution: must stay put
        b2, _ = cd.coordinate_descent(b1, loss, pen,
                                      opts.replace(warm_start=True))
    else:
        kw = {} if kind == "ls" else {"standardize_X": False}
        s1 = f(X, y, lam, options=opts, **kw)
        b1 = s1.x
        loss = (cd.LeastSquaresLoss(y=y, X=X) if kind == "ls"
                else cd.SqrtLassoLoss(y=y, X=X))
        b2, _ = cd.coordinate_descent(b1, loss, cd.ProxL1(lam),
                                      opts.replace(warm_start=True))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-7)

"""Symmetric-matrix iterate (SymmetricSparseIterate) tests.

The reference driver accepts ``SymmetricSparseIterate``
(coordinate_descent.jl:8) — a symmetric p×p matrix optimized over its
p(p+1)/2 packed lower-triangle coordinates — and pins the packed coordinate
numbering in its iterator tests (test/atom_iterator.jl:31-48, :69-85).
The reference ships no symmetric loss; the parity surface is the iterate
abstraction (pack/unpack/indexing) and the driver acceptance, which these
tests exercise end-to-end with a packed quadratic loss whose solution has a
closed form (soft-thresholded covariance).
"""

import numpy as np
import jax.numpy as jnp

import coordinatedescent_jl_tpu as cd


def test_sym_num_coordinates():
    # SymmetricSparseIterate(3) has 6 coordinates
    # (reference test/atom_iterator.jl:38: fullPass = collect(1:6))
    assert cd.sym_num_coordinates(3) == 6
    assert cd.sym_num_coordinates(10) == 55   # :70-77 uses 1:55


def test_sym_indices_order_p3():
    """Packed lower-triangle, column-major — ProximalBase's linear
    indexing of SymmetricSparseIterate (Julia packed-'L' convention)."""
    ij = np.asarray(cd.sym_indices(3))
    want = [(0, 0), (1, 0), (2, 0), (1, 1), (2, 1), (2, 2)]
    assert [tuple(row) for row in ij] == want


def test_sym_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((7, 7))
    M = A + A.T
    v = cd.sym_pack(jnp.asarray(M))
    assert v.shape == (cd.sym_num_coordinates(7),)
    M2 = np.asarray(cd.sym_unpack(v, 7))
    np.testing.assert_allclose(M2, M, atol=1e-12)
    # unpack always yields an exactly symmetric matrix
    assert np.array_equal(M2, M2.T)


def test_sym_single_coordinate_sets_both_halves():
    """Writing packed coordinate k ↔ (i, j) sets M[i,j] AND M[j,i] — the
    defining SymmetricSparseIterate semantics (x[2] = 1 touches (2,1) and
    (1,2), reference test/atom_iterator.jl:33-34)."""
    q = cd.sym_num_coordinates(3)
    v = jnp.zeros((q,)).at[1].set(1.0)       # coordinate 2 (1-based)
    M = np.asarray(cd.sym_unpack(v, 3))
    assert M[1, 0] == 1.0 and M[0, 1] == 1.0
    assert np.sum(M != 0) == 2


def test_symmetric_driver_covariance_thresholding():
    """End-to-end driver acceptance: minimize ½‖M − S‖_F² + λ‖M‖_{1,off}
    over symmetric M via the packed QuadraticLoss.  In packed coordinates
    this is ½ v'Dv − (Ds)'v with D = diag(1 diag / 2 off-diag) and
    off-diagonal penalty weight 2 — closed form: off-diagonals soft(s, λ),
    diagonal preserved."""
    p = 12
    rng = np.random.default_rng(1)
    A = rng.standard_normal((p, 40))
    S = (A @ A.T) / 40.0
    lam = 0.15
    q = cd.sym_num_coordinates(p)
    ij = np.asarray(cd.sym_indices(p))
    offdiag = (ij[:, 0] != ij[:, 1]).astype(np.float64)
    d = 1.0 + offdiag                         # Frobenius multiplicities
    s = np.asarray(cd.sym_pack(jnp.asarray(S)))
    D = jnp.asarray(np.diag(d))
    b = jnp.asarray(-(d * s))
    loss = cd.QuadraticLoss(D, b)
    pen = cd.ProxL1(lam, jnp.asarray(2.0 * offdiag))
    M0 = jnp.zeros((p, p))
    M, _ = cd.symmetric_coordinate_descent(
        M0, loss, pen, cd.CDOptions(opt_tol=1e-10, randomize=False))
    M = np.asarray(M)
    want = np.sign(S) * np.maximum(np.abs(S) - lam, 0.0)
    np.testing.assert_allclose(np.diag(M), np.diag(S), atol=1e-8)
    off = ~np.eye(p, dtype=bool)
    np.testing.assert_allclose(M[off], want[off], atol=1e-8)
    assert np.array_equal(M, M.T)


def test_symmetric_driver_coupled_quadratic():
    """Non-separable packed quadratic (coupled coordinates): the driver's
    solution must satisfy the packed KKT conditions — checks the symmetric
    path through the real block engine, not just the diagonal case."""
    p = 6
    q = cd.sym_num_coordinates(p)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((q, q))
    A = B @ B.T / q + np.eye(q)
    bvec = rng.standard_normal(q)
    lam = 0.3
    loss = cd.QuadraticLoss(jnp.asarray(A), jnp.asarray(bvec))
    M, _ = cd.symmetric_coordinate_descent(
        jnp.zeros((p, p)), loss, cd.ProxL1(lam),
        cd.CDOptions(opt_tol=1e-11, randomize=False))
    v = np.asarray(cd.sym_pack(jnp.asarray(M)))
    g = A @ v + bvec
    kkt = np.where(v != 0, np.abs(g + lam * np.sign(v)),
                   np.maximum(np.abs(g) - lam, 0.0))
    assert np.max(kkt) < 1e-7
    assert np.array_equal(np.asarray(M), np.asarray(M).T)

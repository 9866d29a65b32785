"""Mesh constructors + sharded data ingestion on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import coordinatedescent_jl_tpu as cd
from coordinatedescent_jl_tpu.parallel import (
    feature_mesh,
    grid_mesh,
    lasso_sharded,
    load_design_shard,
    shard_design_matrix,
)


def test_mesh_constructors():
    m1 = feature_mesh()
    assert m1.axis_names == ("feature",) and m1.size == 8
    m2 = grid_mesh(2)
    assert m2.axis_names == ("batch", "feature")
    assert m2.shape["batch"] == 2 and m2.shape["feature"] == 4
    with pytest.raises(ValueError):
        grid_mesh(3)


def test_load_design_shard(tmp_path):
    rng = np.random.default_rng(0)
    n, p = 40, 24
    X = rng.standard_normal((n, p)).astype(np.float32)
    f = str(tmp_path / "X.bin")
    X.tofile(f)
    parts = [load_design_shard(f, n, p, i, 3) for i in range(3)]
    np.testing.assert_array_equal(np.concatenate(parts, axis=1), X)
    assert parts[0].shape == (40, 8)


def test_shard_design_matrix_and_solve(tmp_path):
    rng = np.random.default_rng(1)
    n, p, s = 96, 64, 6
    X = rng.standard_normal((n, p)).astype(np.float64)
    beta = np.zeros(p)
    beta[rng.choice(p, s, replace=False)] = rng.standard_normal(s)
    y = X @ beta + 0.2 * rng.standard_normal(n)

    mesh = feature_mesh()
    # single-process: the "local block" is the whole matrix
    Xg = shard_design_matrix(mesh, X, n, p)
    assert Xg.shape == (n, p)
    np.testing.assert_array_equal(np.asarray(Xg), X)
    # the sharded array feeds the sharded solver directly
    sol = lasso_sharded(Xg, jnp.asarray(y), 0.1, mesh,
                        options=cd.CDOptions(block_size=8))
    ref = cd.lasso(jnp.asarray(X), jnp.asarray(y), 0.1,
                   options=cd.CDOptions(block_size=8))
    np.testing.assert_allclose(sol.x, ref.x, atol=1e-5)

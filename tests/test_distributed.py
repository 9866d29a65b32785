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


def test_plan_column_shards_fake_layouts():
    """Multi-process slicing arithmetic under fake process layouts (no
    multi-process runtime needed): shards are disjoint, ordered, cover
    [0, p) exactly, and trailing shards absorb the raggedness."""
    from coordinatedescent_jl_tpu.parallel import plan_column_shards

    for p, num in [(24, 3), (25, 3), (1, 4), (7, 8), (1000, 7), (64, 1)]:
        plan = plan_column_shards(p, num)
        assert len(plan) == num
        cover = []
        prev_hi = 0
        for lo, hi in plan:
            assert lo == prev_hi and hi >= lo
            cover.extend(range(lo, hi))
            prev_hi = hi
        assert cover == list(range(p))
        widths = [hi - lo for lo, hi in plan]
        # only trailing shards may be narrower, and by at most the full width
        full = widths[0]
        seen_short = False
        for w in widths:
            if w < full:
                seen_short = True
            elif seen_short:
                raise AssertionError(f"non-trailing ragged shard: {widths}")


def test_plan_device_columns_fake_layouts():
    """Per-device slices are equal-width after padding (the device shards
    of a global array must be same-shaped), disjoint, and cover the
    process's local columns."""
    from coordinatedescent_jl_tpu.parallel import plan_device_columns

    for p_local, nd in [(16, 4), (17, 4), (3, 8), (8, 1), (0, 2)]:
        plan = plan_device_columns(p_local, nd)
        assert len(plan) == nd
        widths = {hi - lo + pad for lo, hi, pad in plan}
        assert len(widths) == 1                      # same-shaped shards
        cover = []
        for lo, hi, pad in plan:
            assert 0 <= lo <= hi <= p_local and pad >= 0
            cover.extend(range(lo, hi))
        assert cover == list(range(p_local))


def test_shard_plans_compose_to_global_matrix():
    """End-to-end fake 4-process x 2-device layout (p chosen so only the
    final process is ragged, the contract shard_design_matrix enforces):
    process shards then uniform per-device slices reassemble the exact
    global matrix with zero-padding only at the global tail."""
    from coordinatedescent_jl_tpu.parallel import plan_column_shards

    rng = np.random.default_rng(2)
    n, p, procs, devs = 8, 29, 4, 2
    X = rng.standard_normal((n, p))
    shards = plan_column_shards(p, procs)
    widths = [hi - lo for lo, hi in shards]
    per_dev = -(-widths[0] // devs)
    # this layout satisfies the tail-only-padding contract
    assert all(w == devs * per_dev for w in widths[:-1])
    cols = []
    for lo, hi in shards:
        xl = X[:, lo:hi]
        for i in range(devs):
            dlo = min(i * per_dev, xl.shape[1])
            dhi = min(dlo + per_dev, xl.shape[1])
            blk = xl[:, dlo:dhi]
            if blk.shape[1] < per_dev:
                blk = np.pad(blk, ((0, 0), (0, per_dev - blk.shape[1])))
            cols.append(blk)
    glob = np.concatenate(cols, axis=1)
    assert glob.shape[1] == per_dev * devs * procs
    np.testing.assert_array_equal(glob[:, :p], X)
    assert not np.any(glob[:, p:])


def test_shard_design_matrix_rejects_interior_padding(monkeypatch):
    """A layout whose non-final shards would need zero-padding (feature
    misalignment) must be rejected with a clear error, not silently
    misaligned."""
    import coordinatedescent_jl_tpu.parallel.distributed as dist

    mesh = feature_mesh()
    # fake a 2-process view of the 8-device mesh: each process would own
    # 10 columns of p=20 across 8 local devices -> per_dev=2, 8*2=16 != 10
    # -> interior padding would be required between the process blocks
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    X = np.zeros((4, 10))
    with pytest.raises(ValueError, match="interior zero columns"):
        # the arithmetic check fires before any device placement
        dist.shard_design_matrix(mesh, X, 4, 20)

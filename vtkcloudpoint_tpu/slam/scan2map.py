"""Scan-to-map ICP: register each scan against the accumulated world map.

The tier-4 pipeline's drift-resistant odometry (BASELINE.json config 4
"scan-to-map ICP"): instead of chaining scan-to-scan transforms (error
compounds), each new scan registers against a bounded voxel map of
everything seen so far. The map lives in a fixed-capacity table
(ops/voxel.py) so the whole sequential loop runs under lax.scan with static
shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ICPConfig
from ..ops import se3
from ..ops.voxel import voxel_downsample
from ..register.icp import icp
from .trajectory import Trajectory


class MapState(NamedTuple):
    points: jax.Array   # [M, 3] voxel map in world frame
    mask: jax.Array     # [M]


def scan_to_map(
    scans,
    scan_valid,
    cfg: ICPConfig = ICPConfig(),
    voxel_size: float = 0.2,
    map_capacity: int = 16384,
):
    """Sequentially register scans against the accumulated voxel map.

    scans: [S, N, 3] in their own frames. Returns (Trajectory, final
    MapState). Pose of scan 0 is identity; its points seed the map.
    """
    s, n, _ = scans.shape
    dtype = scans.dtype

    map_pts, map_mask, _ = voxel_downsample(
        scans[0], scan_valid[0], voxel_size, map_capacity
    )

    def step(carry, inp):
        map_pts, map_mask, r_prev, t_prev = carry
        scan, sv = inp
        # init from the previous pose (smooth trajectories)
        res = icp(scan, sv, map_pts, map_mask, cfg, r0=r_prev, t0=t_prev)
        world = se3.apply_rigid(res.r, res.t, scan)
        # merge into the map: re-voxelize map + new points together
        both = jnp.concatenate([map_pts, world])
        both_mask = jnp.concatenate([map_mask, sv])
        map_pts2, map_mask2, _ = voxel_downsample(
            both, both_mask, voxel_size, map_capacity
        )
        return (map_pts2, map_mask2, res.r, res.t), (res.r, res.t, res.error)

    init = (map_pts, map_mask, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype))
    (map_pts, map_mask, _, _), (rs, ts, errs) = jax.lax.scan(
        step, init, (scans[1:], scan_valid[1:])
    )
    r_all = jnp.concatenate([jnp.eye(3, dtype=dtype)[None], rs])
    t_all = jnp.concatenate([jnp.zeros((1, 3), dtype), ts])
    return Trajectory(r_all, t_all), MapState(map_pts, map_mask), errs

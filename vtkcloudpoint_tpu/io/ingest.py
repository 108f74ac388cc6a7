"""Scan ingestion: folder -> PointBatch with conversion, gating, dedup.

The AddFolder import path (FrmMain.cs:916-1134, typpe 1/2): parse files,
range-gate (Distance == 0 or > 1000 dropped), motor->XYZ conversion with axis
remap, optional exact-duplicate removal. Produces a padded PointBatch ready
for the on-device pipeline.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import ImportConfig
from ..data.convert import motor_to_xyz, range_gate
from ..data.pointbatch import PointBatch
from .loaders import load_folder, dedup_exact


def _round_capacity(n: int) -> int:
    """Pad to the next multiple of 1024 (tile-friendly static shapes)."""
    return max(((n + 1023) // 1024) * 1024, 1024)


def import_scan_arrays(
    motor: np.ndarray,
    rng: np.ndarray,
    cfg: ImportConfig = ImportConfig(),
    capacity: Optional[int] = None,
    dtype=jnp.float32,
    path_id: Optional[np.ndarray] = None,
) -> PointBatch:
    """Build a PointBatch from raw (motor, distance) host arrays.

    path_id carries each point's source-file index (Point3D.pathId) through
    the range gate and dedup; dedup keeps the FIRST occurrence's file, like
    the reference's duplicate scan (FrmMain.cs:1063-1089)."""
    keep = np.asarray(range_gate(jnp.asarray(rng), cfg))
    motor = np.asarray(motor)[keep]
    rng = np.asarray(rng)[keep]
    pid = None if path_id is None else np.asarray(path_id, np.int32)[keep]
    xyz = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(rng), cfg))
    mult = np.ones(len(xyz), np.int32)
    if cfg.dedup:
        idx, counts = dedup_exact(xyz)
        xyz, motor, rng = xyz[idx], motor[idx], rng[idx]
        if pid is not None:
            pid = pid[idx]
        mult = counts.astype(np.int32)
    cap = capacity or _round_capacity(len(xyz))
    return PointBatch.from_arrays(
        xyz, motor=motor, rng=rng, mult=mult, path_id=pid,
        capacity=cap, dtype=dtype,
    )


def import_scan_folder(
    folder: str,
    cfg: ImportConfig = ImportConfig(),
    pattern: str = "*.txt",
    capacity: Optional[int] = None,
    dtype=jnp.float32,
):
    """Folder import (reference typpe 1/2 scan mode).

    Returns (PointBatch with per-point path_id, names list indexed by
    path_id)."""
    raw, pid, names = load_folder(folder, pattern)
    batch = import_scan_arrays(raw[:, :2], raw[:, 2], cfg, capacity, dtype,
                               path_id=pid)
    return batch, names

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
) -> PointBatch:
    """Build a PointBatch from raw (motor, distance) host arrays."""
    keep = np.asarray(range_gate(jnp.asarray(rng), cfg))
    motor = np.asarray(motor)[keep]
    rng = np.asarray(rng)[keep]
    xyz = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(rng), cfg))
    mult = np.ones(len(xyz), np.int32)
    if cfg.dedup:
        idx, counts = dedup_exact(xyz)
        xyz, motor, rng = xyz[idx], motor[idx], rng[idx]
        mult = counts.astype(np.int32)
    cap = capacity or _round_capacity(len(xyz))
    return PointBatch.from_arrays(
        xyz, motor=motor, rng=rng, mult=mult, capacity=cap, dtype=dtype
    )


def import_scan_folder(
    folder: str,
    cfg: ImportConfig = ImportConfig(),
    pattern: str = "*.txt",
    capacity: Optional[int] = None,
    dtype=jnp.float32,
):
    """Folder import (reference typpe 1/2 scan mode).

    Returns (PointBatch, path_id i32[N-kept], names)."""
    raw, pid, names = load_folder(folder, pattern)
    batch = import_scan_arrays(raw[:, :2], raw[:, 2], cfg, capacity, dtype)
    return batch, names

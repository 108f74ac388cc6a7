"""Device mesh helpers.

Replaces the reference's in-process ThreadPool fan-out + poll barrier
(FrmMain.cs:1340-1399) with a jax.sharding.Mesh: blocks shard over the
``blocks`` axis, collectives ride ICI (SURVEY.md §2 parallelism inventory).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        # never silently degrade an explicitly-requested mesh size: a
        # 1-device "8-device" run would still pass, masquerading as a
        # multi-chip validation (this bit a dryrun where JAX_PLATFORMS=cpu
        # was ignored by the TPU plugin -- see tests/conftest.py note)
        raise RuntimeError(
            f"make_mesh({n}) but only {len(devs)} device(s) visible "
            f"(platform {devs[0].platform}); force the CPU platform with "
            "jax.config.update('jax_platforms', 'cpu') BEFORE the first "
            "jax op (the JAX_PLATFORMS env var is ignored once the TPU "
            "plugin registers)"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def shard_blocks(mesh: Mesh, arr, axis: str = "blocks"):
    """Shard leading (block) dimension over the mesh."""
    spec = P(axis) if arr.ndim == 1 else P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))

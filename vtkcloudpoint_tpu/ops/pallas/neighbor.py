"""Pallas TPU kernels for neighbor search.

The two hot loops of the whole engine (SURVEY.md §3.2/§3.3):
- radius neighbor COUNT (DBSCAN core test, DBImproved.cs:33-54)
- nearest-neighbor argmin (ICP correspondence, ICP.cs:224-250 / the VTK
  point locator)

Both are tiled so the full [N, M] distance matrix never leaves VMEM: the
grid's inner dimension walks reference tiles while a VMEM scratch carries the
running count / running (min, argmin). Coordinates are laid out
structure-of-arrays [D, N] so each coordinate plane broadcasts along lanes.

On non-TPU backends the public wrappers fall back to the jnp implementation
(same results); tests compare the two.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _pad_to(x, size, axis, fill):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# radius count
# ---------------------------------------------------------------------------

def _count_kernel(q_ref, r_ref, qv_ref, rv_ref, out_ref, acc, *, eps, metric, nd):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # q_ref: [D, TQ], r_ref: [D, TR]; distance block [TQ, TR]
    if metric == "l1_motor":
        d = jnp.zeros((q_ref.shape[1], r_ref.shape[1]), jnp.float32)
        for k in range(nd):
            d = d + jnp.abs(q_ref[k, :][:, None] - r_ref[k, :][None, :])
    else:  # l2: squared distance vs eps^2
        d = jnp.zeros((q_ref.shape[1], r_ref.shape[1]), jnp.float32)
        for k in range(nd):
            diff = q_ref[k, :][:, None] - r_ref[k, :][None, :]
            d = d + diff * diff
    thr = eps if metric == "l1_motor" else eps * eps
    ok = (d <= thr) & rv_ref[0, :][None, :] & qv_ref[0, :][:, None]
    acc[:] = acc[:] + jnp.sum(ok.astype(jnp.int32), axis=1)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc[:]


def radius_count_pallas(coords, valid, eps: float, metric: str = "l1_motor",
                        tile_q: int = 512, tile_r: int = 1024):
    """Neighbor count within eps for every point (count includes self).

    coords: [N, D] float32; valid: [N] bool. Returns i32[N].
    """
    n, nd = coords.shape
    npad = ((n + tile_q - 1) // tile_q) * tile_q
    npad = ((npad + tile_r - 1) // tile_r) * tile_r
    soa = _pad_to(coords.astype(jnp.float32).T, npad, 1, 1e30)  # [D, Npad]
    v = _pad_to(valid[None, :], npad, 1, False)                 # [1, Npad]

    grid = (npad // tile_q, npad // tile_r)
    out = pl.pallas_call(
        functools.partial(_count_kernel, eps=float(eps), metric=metric, nd=nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd, tile_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q,), lambda i, j: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_q,), jnp.int32)],
        interpret=not _on_tpu(),
    )(soa, soa, v, v)
    return out[:n]


def radius_count_jnp(coords, valid, eps: float, metric: str = "l1_motor",
                     chunk: int = 2048):
    """jnp reference/fallback with the same tiling discipline."""
    from ..metrics import pairwise

    n = coords.shape[0]
    pad = (-n) % chunk
    cp = jnp.pad(coords, ((0, pad), (0, 0)))
    vp = jnp.pad(valid, (0, pad))

    def one(args):
        c, v = args
        d = pairwise(c, coords, metric)
        ok = (d <= eps) & valid[None, :] & v[:, None]
        return jnp.sum(ok, axis=1, dtype=jnp.int32)

    out = jax.lax.map(one, (cp.reshape(-1, chunk, coords.shape[1]),
                            vp.reshape(-1, chunk)))
    return out.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# nearest neighbor
# ---------------------------------------------------------------------------

def _nn_kernel(q_ref, r_ref, rv_ref, idx_ref, d2_ref, best_d, best_i, *, nd,
               tile_r):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, 1e30)
        best_i[:] = jnp.zeros_like(best_i)

    d = jnp.zeros((q_ref.shape[1], r_ref.shape[1]), jnp.float32)
    for k in range(nd):
        diff = q_ref[k, :][:, None] - r_ref[k, :][None, :]
        d = d + diff * diff
    d = jnp.where(rv_ref[0, :][None, :], d, 1e30)
    tile_min = jnp.min(d, axis=1)
    tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + j * tile_r
    better = tile_min < best_d[:]
    best_i[:] = jnp.where(better, tile_arg, best_i[:])
    best_d[:] = jnp.where(better, tile_min, best_d[:])

    @pl.when(j == nj - 1)
    def _():
        idx_ref[:] = best_i[:]
        d2_ref[:] = best_d[:]


def nn_pallas(query, ref, ref_valid, tile_q: int = 512, tile_r: int = 1024):
    """Nearest valid reference point per query. Returns (idx i32[N], d2 f32[N]).

    Ties break toward the LOWEST reference index (first tile wins via strict
    <, and argmin within a tile returns the first minimum), matching the
    reference's sequential scan (ICP.cs:235-245).
    """
    n, nd = query.shape
    m = ref.shape[0]
    npad = ((n + tile_q - 1) // tile_q) * tile_q
    mpad = ((m + tile_r - 1) // tile_r) * tile_r
    q = _pad_to(query.astype(jnp.float32).T, npad, 1, 0.0)
    r = _pad_to(ref.astype(jnp.float32).T, mpad, 1, 1e30)
    rv = _pad_to(ref_valid[None, :], mpad, 1, False)

    grid = (npad // tile_q, mpad // tile_r)
    idx, d2 = pl.pallas_call(
        functools.partial(_nn_kernel, nd=nd, tile_r=tile_r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd, tile_q), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad,), jnp.int32),
            jax.ShapeDtypeStruct((npad,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q,), jnp.float32),
            pltpu.VMEM((tile_q,), jnp.int32),
        ],
        interpret=not _on_tpu(),
    )(q, r, rv)
    return idx[:n], d2[:n]

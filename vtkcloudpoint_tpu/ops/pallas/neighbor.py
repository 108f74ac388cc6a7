"""Pallas TPU kernels for neighbor search.

The two hot loops of the whole engine (SURVEY.md §3.2/§3.3):
- radius neighbor COUNT (DBSCAN core test, DBImproved.cs:33-54)
- nearest-neighbor argmin (ICP correspondence, ICP.cs:224-250 / the VTK
  point locator)

Both are tiled so the full [N, M] distance matrix never leaves VMEM: the
grid's inner dimension walks reference tiles while a VMEM scratch carries the
running count / running (min, argmin).

Layout rule (learned on real Mosaic): queries travel AoS [N, D] so a
[tile_q, 1] COLUMN is a plain slice, references travel SoA [D, M] so a
[1, tile_r] ROW is a plain slice -- the [tile_q, tile_r] distance block then
builds from broadcasts only, no lane<->sublane transposes (Mosaic rejects
those). Everything stays 2D; argmin is a masked index-min (ties -> lowest
reference index, matching the reference's sequential scan ICP.cs:235-245).

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
_BIG = 1e30


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

def _count_kernel(q_ref, r_ref, qv_ref, rv_ref, out_ref, acc, *, eps, metric,
                  nd):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    # q_ref: [TQ, D] AoS, r_ref: [D, TR] SoA; distance block [TQ, TR]
    tq = q_ref.shape[0]
    tr = r_ref.shape[1]
    d = jnp.zeros((tq, tr), jnp.float32)
    if metric == "l1_motor":
        for k in range(nd):
            d = d + jnp.abs(q_ref[:, k:k + 1] - r_ref[k:k + 1, :])
        thr = eps
    else:  # l2: squared distance vs eps^2
        for k in range(nd):
            diff = q_ref[:, k:k + 1] - r_ref[k:k + 1, :]
            d = d + diff * diff
        thr = eps * eps
    ok = ((d <= thr) & (rv_ref[0:1, :] > 0.0)
          & (qv_ref[:, 0:1] > 0.0)).astype(jnp.float32)
    acc[:] = acc[:] + jnp.sum(ok, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc[:].astype(jnp.int32)


def radius_count_pallas(coords, valid, eps: float, metric: str = "l1_motor",
                        tile_q: int = 512, tile_r: int = 1024):
    """Neighbor count within eps for every point (count includes self).

    coords: [N, D] float32; valid: [N] bool. Returns i32[N].
    """
    n, nd = coords.shape
    npad = ((n + tile_q - 1) // tile_q) * tile_q
    npad = ((npad + tile_r - 1) // tile_r) * tile_r
    aos = _pad_to(coords.astype(jnp.float32), npad, 0, _BIG)    # [Npad, D]
    soa = aos.T                                                  # [D, Npad]
    vf = valid.astype(jnp.float32)
    v_col = _pad_to(vf[:, None], npad, 0, 0.0)                   # [Npad, 1]
    v_row = _pad_to(vf[None, :], npad, 1, 0.0)                   # [1, Npad]

    grid = (npad // tile_q, npad // tile_r)
    out = pl.pallas_call(
        functools.partial(_count_kernel, eps=float(eps), metric=metric,
                          nd=nd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, nd), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile_q, 1), jnp.float32)],
        interpret=not _on_tpu(),
    )(aos, soa, v_col, v_row)
    return out[:n, 0]


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
        best_d[:] = jnp.full_like(best_d, _BIG)
        best_i[:] = jnp.zeros_like(best_i)

    tq = q_ref.shape[0]
    tr = r_ref.shape[1]
    d = jnp.zeros((tq, tr), jnp.float32)
    for k in range(nd):
        diff = q_ref[:, k:k + 1] - r_ref[k:k + 1, :]
        d = d + diff * diff
    d = jnp.where(rv_ref[0:1, :] > 0.0, d, _BIG)
    tile_min = jnp.min(d, axis=1, keepdims=True)               # [TQ, 1]
    # argmin as masked index-min: ties -> lowest reference index
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1)
    hit = jnp.where(d <= tile_min, cols, jnp.int32(tr))
    tile_arg = (jnp.min(hit, axis=1, keepdims=True)
                + j * tile_r).astype(jnp.float32)              # [TQ, 1]
    better = tile_min < best_d[:]
    best_i[:] = jnp.where(better, tile_arg, best_i[:])
    best_d[:] = jnp.where(better, tile_min, best_d[:])

    @pl.when(j == nj - 1)
    def _():
        idx_ref[:] = best_i[:].astype(jnp.int32)
        d2_ref[:] = best_d[:]


def nn_pallas(query, ref, ref_valid, tile_q: int = 512, tile_r: int = 2048):
    """Nearest valid reference point per query. Returns (idx i32[N], d2 f32[N]).

    Ties break toward the LOWEST reference index (first tile wins via strict
    <, and the masked index-min within a tile returns the first minimum),
    matching the reference's sequential scan (ICP.cs:235-245).
    tile_r indices ride in f32 (exact to 2^24 -- targets beyond 16M points
    per call are unsupported).
    """
    n, nd = query.shape
    m = ref.shape[0]
    npad = ((n + tile_q - 1) // tile_q) * tile_q
    mpad = ((m + tile_r - 1) // tile_r) * tile_r
    q = _pad_to(query.astype(jnp.float32), npad, 0, 0.0)        # [Npad, D]
    r = _pad_to(ref.astype(jnp.float32), mpad, 0, _BIG).T       # [D, Mpad]
    rv = _pad_to(ref_valid.astype(jnp.float32)[None, :], mpad, 1, 0.0)

    grid = (npad // tile_q, mpad // tile_r)
    idx, d2 = pl.pallas_call(
        functools.partial(_nn_kernel, nd=nd, tile_r=tile_r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, nd), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(q, r, rv)
    return idx[:n, 0], d2[:n, 0]

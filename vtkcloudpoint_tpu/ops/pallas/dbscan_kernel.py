"""Pallas TPU kernel: complete per-block DBSCAN in VMEM.

One grid step = one block: coordinates (8 KB) load once, the [cap, cap]
adjacency lives only in VMEM (never in HBM), the min-label fixpoint iterates
on-chip under lax.while_loop, and the two gathers the algorithm needs
(pointer jump, root-rank lookup) become one-hot matmuls on the MXU --
dynamic vector gathers are the one thing the VPU dislikes, and a
[cap, cap] @ [cap, 1] matmul is effectively free.

Everything stays 2D ([cap, 1] columns / [1, cap] rows) per TPU tiling rules.
Same semantics as cluster.dbscan.dbscan_padded (reference-ID-compatible);
tested for bit-equality against it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbor import _on_tpu


def _gather_mxu(values_col, indices_col, cap):
    """values[indices] as one-hot matmul; values_col/indices_col: [cap, 1]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    onehot = (cols == indices_col).astype(jnp.float32)
    return jnp.dot(onehot, values_col.astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def _dbscan_kernel(coords_ref, valid_ref, label_ref, nclus_ref,
                   *, eps, min_pts, metric, cap):
    x_row = coords_ref[0, 0:1, :]                      # [1, cap]
    y_row = coords_ref[0, 1:2, :]
    v_row = valid_ref[0, 0:1, :] != 0                  # [1, cap]
    x_col = jnp.swapaxes(x_row, 0, 1)                  # [cap, 1]
    y_col = jnp.swapaxes(y_row, 0, 1)
    v_col = jnp.swapaxes(v_row, 0, 1)

    if metric == "l1_motor":
        d = jnp.abs(x_col - x_row) + jnp.abs(y_col - y_row)
        thr = eps
    else:  # squared L2 over 2D
        dx = x_col - x_row
        dy = y_col - y_row
        d = dx * dx + dy * dy
        thr = eps * eps
    adj = (d <= thr) & v_col & v_row                   # [cap, cap]

    counts = jnp.sum(adj, axis=1, keepdims=True, dtype=jnp.int32)  # [cap,1]
    core_col = (counts >= min_pts) & v_col
    core_row = jnp.swapaxes(core_col, 0, 1)
    core_adj = adj & core_col & core_row

    iota_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    inf = jnp.int32(cap)
    lab0 = jnp.where(core_col, iota_col, inf)          # [cap, 1]

    def sweep(lab):
        lab_row = jnp.swapaxes(lab, 0, 1)
        nbr = jnp.where(core_adj, lab_row, inf)
        new = jnp.minimum(lab, jnp.min(nbr, axis=1, keepdims=True))
        jumped = _gather_mxu(new, jnp.minimum(new, cap - 1), cap)
        jumped = jumped.astype(jnp.int32)
        return jnp.where(new < inf, jnp.minimum(new, jumped), inf)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        return state[1] & (state[2] < cap)

    lab1 = sweep(lab0)
    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab1, jnp.any(lab1 != lab0), jnp.int32(1))
    )

    # rank roots in index order: rank[i] = sum_{j<=i} is_root[j] (tri matmul)
    is_root = core_col & (lab == iota_col)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
    ).astype(jnp.float32)
    rank = jnp.dot(tri, is_root.astype(jnp.float32),
                   preferred_element_type=jnp.float32)      # [cap, 1]
    rank_at_root = _gather_mxu(rank, jnp.minimum(lab, cap - 1), cap)
    core_id = jnp.where(core_col, rank_at_root.astype(jnp.int32), 0)

    core_id_row = jnp.swapaxes(core_id, 0, 1)
    border_src = jnp.where(adj & core_row, core_id_row, 0)
    border_id = jnp.max(border_src, axis=1, keepdims=True)
    label = jnp.where(core_col, core_id, jnp.where(v_col, border_id, 0))
    label_ref[0, 0, :] = jnp.swapaxes(label, 0, 1)[0, :].astype(jnp.int32)
    nclus_ref[0, 0, 0] = jnp.sum(is_root.astype(jnp.int32))


def dbscan_blocks_pallas(block_coords, block_valid, eps: float, min_pts: int,
                         metric: str = "l1_motor"):
    """Per-block DBSCAN via the fused VMEM kernel.

    block_coords: [B, cap, 2]; block_valid: [B, cap].
    Returns dict(label [B, cap] i32, n_clusters [B] i32) -- same local-id
    semantics as cluster.dbscan.dbscan_blocks.
    """
    B, cap, _ = block_coords.shape
    soa = jnp.swapaxes(block_coords.astype(jnp.float32), 1, 2)  # [B, 2, cap]
    v8 = block_valid.astype(jnp.int8)[:, None, :]               # [B, 1, cap]

    labels, nclus = pl.pallas_call(
        functools.partial(_dbscan_kernel, eps=float(eps),
                          min_pts=int(min_pts), metric=metric, cap=cap),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # 3D blocks: TPU requires the last two block dims to divide
            # (8, 128) or equal the array dims -- (1, cap) over [B, 1, cap]
            # satisfies the latter.
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # scalar per block -> SMEM (scalar stores to VMEM are invalid)
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=not _on_tpu(),
    )(soa, v8)
    return {"label": labels[:, 0, :], "n_clusters": nclus[:, 0, 0]}

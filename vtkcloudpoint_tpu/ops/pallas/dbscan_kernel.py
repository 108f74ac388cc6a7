"""Pallas TPU kernel: complete per-block DBSCAN in VMEM.

One grid step = one block: coordinates load once, the [cap, cap] adjacency
lives only in VMEM (never in HBM), the min-label fixpoint iterates on-chip
under lax.while_loop, and every irregular data movement the algorithm needs
(pointer-jump gather, root-rank lookup, row<->column transposes) becomes a
matmul against a one-hot / identity / triangular matrix on the MXU --
dynamic vector gathers and 1xN transposes are the operations Mosaic's VPU
path dislikes, and a [cap, cap] @ [cap, 1] matmul is effectively free.

The whole kernel computes in float32: labels and ranks are integers <= cap
(<= 2^24), exactly representable, so the MXU matmuls are bit-exact.

Same semantics as cluster.dbscan.dbscan_padded (reference-ID-compatible);
tested for bit-equality against it. Supports every engine metric
(ops.metrics): l1_motor (DBImproved.cs:14-25), l2 (Euclidean, 2D/3D),
signed_sum_xy (the DB.cs:14-25 legacy bug).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbor import _on_tpu


def _t_col(row, eye):
    """[1, cap] -> [cap, 1] transpose as an MXU matmul (eye @ row^T)."""
    return jax.lax.dot_general(
        eye, row, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _t_row(col, eye):
    """[cap, 1] -> [1, cap] transpose as an MXU matmul (col^T @ eye)."""
    return jax.lax.dot_general(
        col, eye, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gather_mxu(values_col, indices_col_f, cols_f):
    """values[indices] as one-hot matmul; all [cap, 1] / [cap, cap] f32."""
    onehot = (cols_f == indices_col_f).astype(jnp.float32)
    return jnp.dot(onehot, values_col, preferred_element_type=jnp.float32)


def _adjacency(coords_ref, eye, *, eps, metric, nd, cap):
    """[cap, cap] f32 eps-adjacency (1.0/0.0) for the block, valid-agnostic."""
    d = jnp.zeros((cap, cap), jnp.float32)
    if metric == "l1_motor":
        for k in range(nd):
            row = coords_ref[0, k:k + 1, :]                # [1, cap]
            d = d + jnp.abs(_t_col(row, eye) - row)
        thr = eps
    elif metric == "signed_sum_xy":
        for k in range(nd):
            row = coords_ref[0, k:k + 1, :]
            d = d + (_t_col(row, eye) - row)
        thr = eps
    else:  # l2: squared distance vs eps^2 (exact, no sqrt)
        for k in range(nd):
            row = coords_ref[0, k:k + 1, :]
            diff = _t_col(row, eye) - row
            d = d + diff * diff
        thr = eps * eps
    return (d <= thr).astype(jnp.float32)


def _dbscan_kernel(coords_ref, valid_ref, label_ref, nclus_ref, core_ref,
                   *, eps, min_pts, metric, nd, cap):
    # Mosaic's tpu.iota is integer-only: build i32 and cast
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    eye = (rows_i == cols_i).astype(jnp.float32)
    cols_f = cols_i.astype(jnp.float32)
    iota_col = jax.lax.broadcasted_iota(
        jnp.int32, (cap, 1), 0).astype(jnp.float32)

    v_row = valid_ref[0, 0:1, :]                       # [1, cap] f32 0/1
    v_col = _t_col(v_row, eye)                         # [cap, 1]
    adj = _adjacency(coords_ref, eye, eps=eps, metric=metric, nd=nd,
                     cap=cap) * v_col * v_row          # [cap, cap] f32 0/1

    counts = jnp.sum(adj, axis=1, keepdims=True)       # [cap, 1] f32 exact
    core_col = jnp.where((counts >= min_pts) & (v_col > 0.0), 1.0, 0.0)
    core_row = _t_row(core_col, eye)
    core_adj = adj * core_col * core_row               # f32 0/1

    inf = jnp.float32(cap)
    lab0 = jnp.where(core_col > 0.0, iota_col, inf)    # [cap, 1] f32

    def sweep(lab):
        lab_row = _t_row(lab, eye)
        nbr = jnp.where(core_adj > 0.0, lab_row, inf)
        new = jnp.minimum(lab, jnp.min(nbr, axis=1, keepdims=True))
        jumped = _gather_mxu(new, jnp.minimum(new, cap - 1.0), cols_f)
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
    is_root = jnp.where((core_col > 0.0) & (lab == iota_col), 1.0, 0.0)
    tri = (cols_i <= rows_i).astype(jnp.float32)
    rank = jnp.dot(tri, is_root, preferred_element_type=jnp.float32)
    rank_at_root = _gather_mxu(rank, jnp.minimum(lab, cap - 1.0), cols_f)
    core_id = jnp.where(core_col > 0.0, rank_at_root, 0.0)   # [cap, 1]

    # border points take the MAX adjacent core id (dbscan.py rule 4)
    core_id_row = _t_row(core_id, eye)
    border_src = adj * core_row * core_id_row
    border_id = jnp.max(border_src, axis=1, keepdims=True)
    label = jnp.where(core_col > 0.0, core_id,
                      jnp.where(v_col > 0.0, border_id, 0.0))
    label_ref[0, 0, :] = _t_row(label, eye)[0, :].astype(jnp.int32)
    core_ref[0, 0, :] = core_row[0, :].astype(jnp.int32)
    nclus_ref[0, 0, 0] = jnp.sum(is_root).astype(jnp.int32)


def dbscan_blocks_pallas(block_coords, block_valid, eps: float, min_pts: int,
                         metric: str = "l1_motor"):
    """Per-block DBSCAN via the fused VMEM kernel.

    block_coords: [B, cap, D]; block_valid: [B, cap].
    Returns dict(label [B, cap] i32, n_clusters [B] i32, core [B, cap] bool)
    -- a drop-in for cluster.dbscan.dbscan_blocks (same local-id semantics,
    bit-equal labels).
    """
    B, cap, nd = block_coords.shape
    soa = jnp.swapaxes(block_coords.astype(jnp.float32), 1, 2)  # [B, D, cap]
    vf = block_valid.astype(jnp.float32)[:, None, :]            # [B, 1, cap]

    labels, nclus, core = pl.pallas_call(
        functools.partial(_dbscan_kernel, eps=float(eps),
                          min_pts=float(min_pts), metric=metric,
                          nd=nd, cap=cap),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nd, cap), lambda b: (b, 0, 0),
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
            pl.BlockSpec((1, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, cap), jnp.int32),
        ),
        interpret=not _on_tpu(),
    )(soa, vf)
    return {
        "label": labels[:, 0, :],
        "n_clusters": nclus[:, 0, 0],
        "core": core[:, 0, :] != 0,
    }

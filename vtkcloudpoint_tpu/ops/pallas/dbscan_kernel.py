"""Pallas TPU kernel: complete per-block DBSCAN in VMEM.

One grid step = one block: coordinates load once, the [cap, cap] adjacency
lives only in VMEM (never in HBM), and the min-label fixpoint iterates
on-chip under lax.while_loop as pure VPU min-sweeps -- converging in
O(core-graph diameter) sweeps, each a masked row-min over the resident
adjacency, with no HBM traffic in the loop.

Mosaic facts this design is built on (probed on real v5e):
- f32 [cap,1]<->[1,cap] transposes compile and are bit-exact (ONLY the bool
  variant is unimplemented), so all row/column moves are plain swapaxes;
- the MXU's default precision truncates inputs to bf16, which corrupts f32
  coordinates and any gathered value > 256 -- the kernel's two matmuls
  (root-rank prefix sum against a 0/1 triangle, one-hot rank gather) are
  exact because 0/1 operands are bf16-exact and the value-carrying gather
  runs at Precision.HIGHEST;
- VMEM is 16 MB: peak residency here is the adjacency + one sweep temp
  (~8 MB at cap=1024); an earlier variant that also kept identity/column
  matrices for matmul-based transposes exceeded the limit.

The whole kernel computes in float32: labels and ranks are integers <= cap
(<= 2^24), exactly representable.

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


def _t(x):
    """Exact f32 transpose between [cap, 1] and [1, cap]."""
    return jnp.swapaxes(x, 0, 1)


def _one_block(coords_rows, v_row, *, eps, min_pts, metric, nd, cap):
    """Full DBSCAN for one block from in-VMEM values.

    coords_rows: list of nd [1, cap] f32 coordinate rows; v_row: [1, cap]
    f32 0/1 validity.  Returns (label [1, cap] f32, core [1, cap] f32,
    n_clusters scalar f32).  Factored out so the grouped kernel
    (dbscan_blocks_pallas_batched) can unroll it per group member.
    """
    iota_col = jax.lax.broadcasted_iota(
        jnp.int32, (cap, 1), 0).astype(jnp.float32)

    v_col = _t(v_row)
    d = jnp.zeros((cap, cap), jnp.float32)
    if metric == "l1_motor":
        for k in range(nd):
            row = coords_rows[k]                       # [1, cap]
            d = d + jnp.abs(_t(row) - row)
        thr = eps
    elif metric == "signed_sum_xy":
        for k in range(nd):
            row = coords_rows[k]
            d = d + (_t(row) - row)
        thr = eps
    else:  # l2: squared distance vs eps^2 (exact, no sqrt)
        for k in range(nd):
            row = coords_rows[k]
            diff = _t(row) - row
            d = d + diff * diff
        thr = eps * eps
    adj = (d <= thr).astype(jnp.float32) * v_col * v_row

    counts = jnp.sum(adj, axis=1, keepdims=True)       # [cap, 1] f32 exact
    core_col = jnp.where((counts >= min_pts) & (v_col > 0.0), 1.0, 0.0)
    core_row = _t(core_col)

    inf = jnp.float32(cap)
    lab0 = jnp.where(core_col > 0.0, iota_col, inf)    # [cap, 1] f32

    # the core-adjacency mask is loop-invariant: hoist it as an ADDITIVE
    # mask (0 on core-adjacent entries, 2*cap elsewhere -- labels are
    # <= cap, so masked entries can never win the min). Each sweep then
    # costs one add + one min-reduce per element instead of
    # mul + compare + select + min.
    mask_add = jnp.where((adj * core_row) > 0.0, 0.0, jnp.float32(2 * cap))

    def sweep(lab):
        nbr = _t(lab) + mask_add
        new = jnp.min(nbr, axis=1, keepdims=True)
        return jnp.where(core_col > 0.0, jnp.minimum(lab, new), inf)

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

    # rank roots in index order: rank[i] = sum_{j<=i} is_root[j].
    # 0/1 operands are bf16-exact, f32 accumulate => default precision exact.
    is_root = jnp.where((core_col > 0.0) & (lab == iota_col), 1.0, 0.0)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    tri = (cols_i <= rows_i).astype(jnp.float32)
    rank = jnp.dot(tri, is_root, preferred_element_type=jnp.float32)

    # rank[lab] as a one-hot matmul; HIGHEST: gathered values reach cap,
    # beyond bf16's 256-integer exactness
    onehot = (cols_i.astype(jnp.float32)
              == jnp.minimum(lab, cap - 1.0)).astype(jnp.float32)
    rank_at_root = jnp.dot(onehot, rank, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    core_id = jnp.where(core_col > 0.0, rank_at_root, 0.0)   # [cap, 1]

    # border points take the MAX adjacent core id (dbscan.py rule 4)
    border_src = adj * core_row * _t(core_id)
    border_id = jnp.max(border_src, axis=1, keepdims=True)
    label = jnp.where(core_col > 0.0, core_id,
                      jnp.where(v_col > 0.0, border_id, 0.0))
    return _t(label), core_row, jnp.sum(is_root)


def _dbscan_kernel(coords_ref, valid_ref, label_ref, nclus_ref, core_ref,
                   *, eps, min_pts, metric, nd, cap):
    rows = [coords_ref[0, k:k + 1, :] for k in range(nd)]
    v_row = valid_ref[0, 0:1, :]                       # [1, cap] f32 0/1
    label, core_row, n = _one_block(rows, v_row, eps=eps, min_pts=min_pts,
                                    metric=metric, nd=nd, cap=cap)
    label_ref[0, 0, :] = label[0, :].astype(jnp.int32)
    core_ref[0, 0, :] = core_row[0, :].astype(jnp.int32)
    nclus_ref[0, 0, 0] = n.astype(jnp.int32)


def _dbscan_kernel_grouped(coords_ref, valid_ref, label_ref, nclus_ref,
                           core_ref, *, eps, min_pts, metric, nd, cap,
                           group):
    """G complete per-block solves per grid step (statically unrolled).

    Same per-member code as the one-block kernel -- each member keeps its
    own minimal while_loop trip count -- so labels are bit-equal by
    construction; only the grid-step count (and its fixed per-step cost)
    changes.
    """
    for g in range(group):
        rows = [coords_ref[g, k:k + 1, :] for k in range(nd)]
        v_row = valid_ref[g, 0:1, :]
        label, core_row, n = _one_block(rows, v_row, eps=eps,
                                        min_pts=min_pts, metric=metric,
                                        nd=nd, cap=cap)
        label_ref[g, 0, :] = label[0, :].astype(jnp.int32)
        core_ref[g, 0, :] = core_row[0, :].astype(jnp.int32)
        nclus_ref[g, 0, 0] = n.astype(jnp.int32)


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


def dbscan_blocks_pallas_batched(block_coords, block_valid, eps: float,
                                 min_pts: int, metric: str = "l1_motor",
                                 group: int = 4):
    """Per-block DBSCAN, `group` blocks per grid step.

    Bit-equal to dbscan_blocks_pallas (same unrolled per-member code);
    amortizes the fixed per-grid-step cost over `group` blocks. B is
    padded up to a multiple of `group` with empty blocks (all-invalid
    rows produce label 0 / no clusters, discarded on slice-back).
    VMEM bounds `group`: each member's solve keeps ~3 [cap, cap] f32
    arrays live, but members run sequentially so residency stays
    ~one member's set plus the group's [G, nd, cap] inputs.
    """
    B, cap, nd = block_coords.shape
    Bp = -(-B // group) * group
    if Bp != B:
        block_coords = jnp.concatenate(
            [block_coords,
             jnp.zeros((Bp - B, cap, nd), block_coords.dtype)], axis=0)
        block_valid = jnp.concatenate(
            [block_valid, jnp.zeros((Bp - B, cap), block_valid.dtype)],
            axis=0)
    soa = jnp.swapaxes(block_coords.astype(jnp.float32), 1, 2)
    vf = block_valid.astype(jnp.float32)[:, None, :]

    labels, nclus, core = pl.pallas_call(
        functools.partial(_dbscan_kernel_grouped, eps=float(eps),
                          min_pts=float(min_pts), metric=metric,
                          nd=nd, cap=cap, group=group),
        grid=(Bp // group,),
        in_specs=[
            pl.BlockSpec((group, nd, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((group, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1, cap), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1, cap), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1, cap), jnp.int32),
        ),
        interpret=not _on_tpu(),
    )(soa, vf)
    return {
        "label": labels[:B, 0, :],
        "n_clusters": nclus[:B, 0, 0],
        "core": core[:B, 0, :] != 0,
    }

"""Multi-device clustering + registration via shard_map + collectives.

Distributed equivalents of the reference's single-process machinery
(SURVEY.md §2 "Parallelism & communication inventory"):

- per-block DBSCAN: blocks shard over the mesh ``blocks`` axis; each device
  clusters its blocks locally (the ThreadPool fan-out, FrmMain.cs:1356-1361,
  with the barrier now an XLA program boundary).
- cross-block fusion: per-block run counts all_gather to every device
  (they are tiny); the keep/renumber rules are computed replicated so all
  devices agree on global ids without a host round-trip.
- noise re-cluster: each device packs its noise points into a fixed-capacity
  buffer, all_gather produces the globally-ordered noise list (device-major
  = block-major order, matching the sequential reference order), and the
  small re-cluster runs replicated (FrmMain.cs:1507-1520 semantics).
- ICP: source points shard over devices; each ICP iteration computes local
  correspondence partial sums and psum-reduces the 3x3 cross-covariance +
  means + error (the distributed normal equations); the 4x4 Horn eigensolve
  is replicated. One psum per iteration, no host sync.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ICPConfig
from ..cluster.dbscan import dbscan_padded, dbscan_blocks
from ..ops import se3
from ..ops.metrics import pairwise_sqdist


def sharded_blocked_dbscan(
    mesh: Mesh,
    block_coords,
    block_valid,
    eps: float,
    min_pts: int,
    metric: str = "l1_motor",
    min_cluster_size: int = 3,
    quirks: bool = True,
    noise_capacity_per_device: int = 1024,
    halo_merge: bool = False,
    halo_cap: int = 64,
    max_ids: int = 4096,
    axis: str = "blocks",
):
    """Distributed blocked DBSCAN + fusion.

    block_coords: [B, cap, D], block_valid: [B, cap]; B must divide by the
    mesh size. Returns (global block labels [B, cap], n_total).

    halo_merge=True additionally all_gathers per-device eps-shell halo
    buffers and runs the replicated union-find (cluster.halo_fusion) so
    clusters split across blocks/devices unify -- the payload on the
    interconnect is the boundary shell only.
    """
    B, cap, D = block_coords.shape
    ndev = mesh.shape[axis]
    assert B % ndev == 0, f"blocks {B} not divisible by mesh size {ndev}"
    kmax = cap + 1

    def local_fusion_ids(labels_loc, valid_loc, dev_idx):
        """Counts for the local shard: [Bloc, cap+1]."""
        bloc = labels_loc.shape[0]
        seg = (
            jnp.arange(bloc, dtype=jnp.int32)[:, None] * kmax + labels_loc
        ).reshape(-1)
        w = valid_loc.reshape(-1).astype(jnp.int32)
        return jax.ops.segment_sum(w, seg, num_segments=bloc * kmax).reshape(
            bloc, kmax
        )

    def fn(coords_loc, valid_loc):
        dev = jax.lax.axis_index(axis)
        db = dbscan_blocks(coords_loc, valid_loc, eps, min_pts, metric)
        labels_loc = db["label"]
        counts_loc = local_fusion_ids(labels_loc, valid_loc, dev)
        counts = jax.lax.all_gather(counts_loc, axis).reshape(B, kmax)

        # replicated keep/renumber (same rules as cluster.fusion.merge_blocks)
        present = counts[:, 1:] > 0
        n_run = counts[:, 1:]
        if quirks:
            has_noise = counts[:, 0] > 0
            max_id = jnp.max(
                jnp.where(present, jnp.arange(1, kmax)[None, :], 0), axis=1
            )
            is_last = jnp.arange(1, kmax)[None, :] == max_id[:, None]
            eff = jnp.where(
                (jnp.arange(1, kmax)[None, :] == 1) & ~has_noise[:, None],
                n_run + 1,
                n_run,
            )
            keep = present & (is_last | (eff > min_cluster_size))
        else:
            keep = present & (n_run > min_cluster_size)
        gid = jnp.cumsum(keep.reshape(-1).astype(jnp.int32)).reshape(B, cap)
        n_kept = gid.reshape(-1)[-1]

        bloc = labels_loc.shape[0]
        my_rows = dev * bloc + jnp.arange(bloc)
        keep_full = jnp.concatenate([jnp.zeros((B, 1), bool), keep], 1)[my_rows]
        gid_full = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), gid], 1)[my_rows]
        b_idx = jnp.arange(bloc)[:, None]
        point_keep = keep_full[b_idx, labels_loc]
        point_gid = jnp.where(
            valid_loc & point_keep, gid_full[b_idx, labels_loc], 0
        )

        # ---- noise re-cluster across shards ----
        noise_mask = valid_loc & (point_gid == 0)
        # stable argsort preserves slot order within equal (block, id) keys
        sentinel = jnp.int32(2**31 - 1)
        okey = jnp.arange(bloc, dtype=jnp.int32)[:, None] * kmax + labels_loc
        okey = jnp.where(noise_mask, okey, sentinel).reshape(-1)
        order = jnp.argsort(okey, stable=True)[:noise_capacity_per_device]
        sel_valid = okey[order] < sentinel
        cflat = coords_loc.reshape(bloc * cap, D)
        my_noise = jnp.where(sel_valid[:, None], cflat[order], 0.0)
        all_noise = jax.lax.all_gather(my_noise, axis).reshape(-1, D)
        all_sel = jax.lax.all_gather(sel_valid, axis).reshape(-1)
        cf_seed = (n_kept - 1) if quirks else n_kept
        re = dbscan_padded(all_noise, all_sel, eps, min_pts, metric, cf=cf_seed)
        n_total = cf_seed + re["n_clusters"]
        my_re = re["label"].reshape(ndev, -1)[dev]

        flat_gid = point_gid.reshape(-1)
        flat_gid = flat_gid.at[order].set(
            jnp.where(sel_valid, my_re, flat_gid[order])
        )
        out_labels = flat_gid.reshape(bloc, cap)

        if halo_merge:
            from ..cluster.halo_fusion import (
                halo_buffers, union_ids, apply_halo_merge,
            )

            hx, hlab, hval, _ = halo_buffers(
                coords_loc, valid_loc, out_labels,
                db["core"], eps, halo_cap,
            )
            hx = jax.lax.all_gather(hx, axis).reshape(-1, D)
            hlab = jax.lax.all_gather(hlab, axis).reshape(-1)
            hval = jax.lax.all_gather(hval, axis).reshape(-1)
            uni = union_ids(hx, hlab, hval, n_total, eps, metric, max_ids)
            out_labels = apply_halo_merge(out_labels, uni["remap"])
            n_total = uni["n_after"]

        return out_labels, n_total[None]

    out_labels, n_total = jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )
    )(block_coords, block_valid)
    return out_labels, n_total[0]


def sharded_icp(
    mesh: Mesh,
    source,
    source_valid,
    target,
    target_valid,
    cfg: ICPConfig = ICPConfig(),
    axis: str = "blocks",
):
    """Distributed ICP: source sharded over the mesh, target replicated.

    Per iteration: local NN correspondence + psum-reduced weighted sums for
    the Horn solve. Returns (R, t, error, iterations).
    """
    n = source.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0

    def fn(src_loc, sv_loc, tgt, tv):
        w_loc = sv_loc.astype(src_loc.dtype)
        bad = jnp.where(tv, 0.0, jnp.inf)

        def psums(p):
            idx = jnp.argmin(pairwise_sqdist(p, tgt) + bad[None, :], axis=1)
            y = tgt[idx]
            d2 = jnp.sum((p - y) ** 2, axis=1)
            # partial sums for the weighted Horn solve
            sw = jnp.sum(w_loc)
            sp = jnp.sum(p * w_loc[:, None], 0)
            sy = jnp.sum(y * w_loc[:, None], 0)
            spy = (p * w_loc[:, None]).T @ y
            sd = jnp.sum(jnp.where(sv_loc, d2, 0.0))
            tot = jax.lax.psum(
                jnp.concatenate(
                    [sw[None], sp, sy, spy.reshape(-1), sd[None]]
                ),
                axis,
            )
            return tot

        def horn_from_sums(tot):
            # single shared moment-form solve (ops.se3) so the sharded and
            # single-device paths cannot drift
            return se3.horn_from_moments(
                tot[0], tot[1:4], tot[4:7], tot[7:16].reshape(3, 3)
            )

        def body(state):
            r, t, prev_d, it, _ = state
            p = se3.apply_rigid(r, t, src_loc)
            tot = psums(p)
            d = tot[16]
            r1, t1 = horn_from_sums(tot)
            r_new, t_new = se3.compose(r1, t1, r, t)
            return r_new, t_new, d, it + 1, jnp.abs(d - prev_d) < cfg.tol

        def cond(state):
            return (~state[4]) & (state[3] < cfg.max_iterations)

        r0 = jnp.eye(3, dtype=src_loc.dtype)
        if cfg.start_by_matching_centroids:
            sw = jax.lax.psum(jnp.sum(w_loc), axis)
            sp = jax.lax.psum(jnp.sum(src_loc * w_loc[:, None], 0), axis)
            wt = tv.astype(src_loc.dtype)
            t0 = jnp.sum(tgt * wt[:, None], 0) / jnp.maximum(
                jnp.sum(wt), 1.0
            ) - sp / jnp.maximum(sw, 1.0)
        else:
            t0 = jnp.zeros(3, src_loc.dtype)
        r, t, d, it, conv = jax.lax.while_loop(
            cond, body, (r0, t0, jnp.inf, jnp.int32(0), jnp.array(False))
        )
        return r[None], t[None], d[None], it[None]

    r, t, d, it = jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P(), P()),
        )
    )(source, source_valid, target, target_valid)
    return r[0], t[0], d[0], it[0]

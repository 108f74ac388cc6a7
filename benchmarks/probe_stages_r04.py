"""Round-4 stage micro-probe: find where fusion/bucket/shapes spend time on
the real chip, and race candidate reformulations (VERDICT r3 next item 2).

Times sub-stages of the tier-2 bench with the same k-rep differencing trick
as bench.py (tunnel dispatch is ~25 ms; block_until_ready does not flush).
Prints one JSON line per probe to stdout.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 500_000
BLOCK_CAP = 1024
EPS = 0.004
MIN_PTS = 8
NOISE_CAP = 4096
MAX_CLUSTERS = 1024
CLUSTER_CAP = 1024
MAX_HULL = 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jaxcache") + "-dev")
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import synthetic_cloud
    from vtkcloudpoint_tpu.cluster.blocks import (
        assign_blocks_balanced, gather_blocks_ordered)
    from vtkcloudpoint_tpu.cluster.dbscan import dbscan_blocks_dispatch
    from vtkcloudpoint_tpu.cluster.fusion import (
        merge_blocks, _block_label_counts, block_keep_renumber,
        apply_block_gid, noise_pack_order)
    from vtkcloudpoint_tpu.cluster.dbscan import dbscan_padded
    from vtkcloudpoint_tpu.ops.segment import bucket_by_cluster
    from vtkcloudpoint_tpu.ops.geometry import (
        convex_hull, convex_hull_quick, min_enclosing_circle, min_area_rect,
        cluster_shapes)

    n = N
    max_blocks = (n + BLOCK_CAP - 1) // BLOCK_CAP
    kmax = BLOCK_CAP + 1
    motor, xyz, truth = synthetic_cloud(n)
    motor_d = jnp.asarray(motor)
    xyz_d = jnp.asarray(xyz)
    valid = jnp.ones(n, bool)

    part = jax.jit(lambda m, v: assign_blocks_balanced(m, v, BLOCK_CAP))(
        motor_d, valid)
    bc, bv, pidx, _ = jax.jit(lambda m, o, v: gather_blocks_ordered(
        m, o, v, max_blocks, BLOCK_CAP))(motor_d, part["order"], valid)
    db = dbscan_blocks_dispatch(bc, bv, EPS, MIN_PTS, "l1_motor",
                                chunk=16, backend="jnp")
    labels, bcore = db["label"], db["core"]
    fused = jax.jit(lambda l, v, c, p: merge_blocks(
        l, v, c, p, n, EPS, MIN_PTS, "l1_motor", quirks=False,
        noise_capacity=NOISE_CAP))(labels, bv, bc, pidx)
    glabel = fused["label"]
    table, _ = jax.jit(lambda l, v: bucket_by_cluster(
        l, v, MAX_CLUSTERS, CLUSTER_CAP))(glabel, valid)
    counts = _block_label_counts(labels, bv, kmax)

    def t(f, *a, k=8):
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[:8])

        def run_n(nrun):
            t0 = time.perf_counter()
            out = None
            for _ in range(nrun):
                out = f(*a)
            sync(out)
            return time.perf_counter() - t0

        run_n(1)
        t1 = min(run_n(1) for _ in range(2))
        tk = run_n(k)
        return round(max(tk - t1, 0.0) / (k - 1) * 1e3, 2)

    j = jax.jit

    # ---------- fusion sub-stages ----------
    f_counts = j(lambda l, v: _block_label_counts(l, v, kmax))
    emit(probe="fusion.block_label_counts_scatter", ms=t(f_counts, labels, bv))

    def counts_compare(l, v):
        ids = jnp.arange(kmax, dtype=l.dtype)

        def step(lv):
            lb, vl = lv
            return jnp.sum(
                (lb[:, None, :] == ids[None, :, None]) & vl[:, None, :],
                axis=2, dtype=jnp.int32)

        chunks = 8
        B = l.shape[0]
        pad = (-B) % chunks
        lp = jnp.pad(l, ((0, pad), (0, 0)), constant_values=0)
        vp = jnp.pad(v, ((0, pad), (0, 0)))
        out = jax.lax.map(step, (lp.reshape(chunks, -1, l.shape[1]),
                                 vp.reshape(chunks, -1, l.shape[1])))
        return out.reshape(-1, kmax)[:B]

    f_cc = j(counts_compare)
    same = bool(np.array_equal(np.asarray(f_cc(labels, bv)),
                               np.asarray(counts)))
    emit(probe="fusion.block_label_counts_compare", ms=t(f_cc, labels, bv),
         equal=same)

    keep, gid, n_kept = jax.jit(lambda c: block_keep_renumber(c, 3, False))(counts)
    f_apply = j(lambda l, v, k_, g: apply_block_gid(l, v, k_, g))
    emit(probe="fusion.apply_block_gid", ms=t(f_apply, labels, bv, keep, gid))

    point_gid = f_apply(labels, bv, keep, gid)
    noise_mask = bv & (point_gid == 0)
    f_pack = j(lambda l, m: noise_pack_order(l, m, NOISE_CAP))
    emit(probe="fusion.noise_pack_argsort", ms=t(f_pack, labels, noise_mask))

    order, sel = f_pack(labels, noise_mask)
    cflat = bc.reshape(-1, 2)
    ncoords = jnp.where(sel[:, None], cflat[order], 0.0)
    f_re = j(lambda c, s: dbscan_padded(c, s, EPS, MIN_PTS, "l1_motor", cf=100))
    emit(probe="fusion.noise_recluster_dense4096", ms=t(f_re, ncoords, sel))

    # final scatter to original order vs gather-by-rank
    pgf = point_gid.reshape(-1)
    pi = pidx.reshape(-1)

    def scatter_back(pgf_, pi_):
        lab = jnp.zeros(n, jnp.int32)
        return lab.at[jnp.where(pi_ >= 0, pi_, n)].set(pgf_, mode="drop")

    f_sc = j(scatter_back)
    emit(probe="fusion.label_scatter", ms=t(f_sc, pgf, pi))

    # rank[i] = flat slot of point i (from the partition's own order array)
    rank = jnp.zeros(n, jnp.int32).at[part["order"]].set(
        jnp.arange(n, dtype=jnp.int32))

    def gather_back(pgf_, rank_):
        total = max_blocks * BLOCK_CAP
        safe = jnp.minimum(rank_, total - 1)
        return jnp.where(rank_ < total, pgf_[safe], 0)

    f_ga = j(gather_back)
    same = bool(np.array_equal(np.asarray(f_sc(pgf, pi)),
                               np.asarray(f_ga(pgf, rank))))
    emit(probe="fusion.label_gather_by_rank", ms=t(f_ga, pgf, rank),
         equal=same)

    # ---------- bucket ----------
    f_b0 = j(lambda l, v: bucket_by_cluster(l, v, MAX_CLUSTERS, CLUSTER_CAP))
    emit(probe="bucket.current", ms=t(f_b0, glabel, valid))

    def bucket_gather(label, v):
        lab = jnp.where(v, label, MAX_CLUSTERS)
        order_ = jnp.argsort(lab, stable=True)
        sorted_lab = lab[order_]
        first = jnp.searchsorted(sorted_lab, jnp.arange(MAX_CLUSTERS + 1))
        run = (first[1:] - first[:-1]).astype(jnp.int32)
        r = jnp.arange(CLUSTER_CAP, dtype=first.dtype)
        src = jnp.minimum(first[:MAX_CLUSTERS, None] + r[None, :], n - 1)
        ok = r[None, :] < run[:, None]
        tab = jnp.where(ok, order_[src].astype(jnp.int32), -1)
        return tab, jnp.maximum(run - CLUSTER_CAP, 0)

    f_b1 = j(bucket_gather)
    same = bool(np.array_equal(np.asarray(f_b1(glabel, valid)[0]),
                               np.asarray(table)))
    emit(probe="bucket.gather", ms=t(f_b1, glabel, valid), equal=same)

    f_srt = j(lambda x: jnp.argsort(x, stable=True))
    emit(probe="baseline.argsort_500k_i32", ms=t(f_srt, glabel))

    # ---------- shapes sub-stages ----------
    safe = jnp.clip(table, 0, n - 1)
    tvalid = table >= 0
    pts2 = jnp.where(tvalid[..., None], motor_d[safe], 0.0)

    f_hull = j(lambda p, v: jax.vmap(
        lambda pp, vv: convex_hull(pp, vv, MAX_HULL))(p, v))
    emit(probe="shapes.hull_giftwrap", ms=t(f_hull, pts2, tvalid))
    hp, hv = f_hull(pts2, tvalid)

    f_hq = j(lambda p, v: jax.vmap(
        lambda pp, vv: convex_hull_quick(pp, vv, MAX_HULL))(p, v))
    emit(probe="shapes.hull_quick", ms=t(f_hq, pts2, tvalid))

    f_mec = j(lambda p, v: jax.vmap(min_enclosing_circle)(p, v))
    emit(probe="shapes.mec", ms=t(f_mec, hp, hv))

    f_rect = j(lambda p, v: jax.vmap(min_area_rect)(p, v))
    emit(probe="shapes.rect", ms=t(f_rect, hp, hv))

    cnts = jnp.sum(tvalid, axis=1, dtype=jnp.int32)
    f_all = j(lambda p, v, c: cluster_shapes(p, v, c, max_hull=MAX_HULL,
                                             chunk_k=MAX_CLUSTERS,
                                             hull="wrap"))
    emit(probe="shapes.full_wrap", ms=t(f_all, pts2, tvalid, cnts))
    f_allq = j(lambda p, v, c: cluster_shapes(p, v, c, max_hull=MAX_HULL,
                                              chunk_k=MAX_CLUSTERS,
                                              hull="quick"))
    ow = f_all(pts2, tvalid, cnts)
    oq = f_allq(pts2, tvalid, cnts)
    rad_eq = bool(np.allclose(np.asarray(ow["radius"]),
                              np.asarray(oq["radius"]), rtol=1e-5, atol=1e-7))
    area_eq = bool(np.allclose(np.asarray(ow["rect_area"]),
                               np.asarray(oq["rect_area"]),
                               rtol=1e-5, atol=1e-7))
    emit(probe="shapes.full_quick", ms=t(f_allq, pts2, tvalid, cnts),
         radius_eq=rad_eq, area_eq=area_eq)


if __name__ == "__main__":
    main()

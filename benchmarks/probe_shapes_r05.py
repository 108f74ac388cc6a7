"""Round-5 shapes probe: race the Elzinga-Hearn support-iteration MEC
against the C(h,3) triple scan on the real chip at the bench shape
(VERDICT r4 weak item 2 / next item 3 -- same probe discipline as the
round-4 quickhull race).

Inputs reproduce bench.py's shapes stage exactly: the 500k-pt cloud's
bucketed cluster tables ([2 x 1024, 1024] points, max_hull 32, both
coordinate systems in one batched call). Prints one JSON line per probe.
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

    from bench import synthetic_cloud
    from vtkcloudpoint_tpu.cluster.blocks import partition_gather_sorted
    from vtkcloudpoint_tpu.cluster.dbscan import dbscan_blocks_dispatch
    from vtkcloudpoint_tpu.cluster.fusion import merge_blocks
    from vtkcloudpoint_tpu.ops.segment import bucket_payload_by_cluster
    from vtkcloudpoint_tpu.ops.geometry import (
        cluster_shapes, convex_hull, min_enclosing_circle,
        min_enclosing_circle_eh,
    )

    n = N
    max_blocks = (n + BLOCK_CAP - 1) // BLOCK_CAP
    motor, xyz, truth = synthetic_cloud(n)
    motor_d, xyz_d = jnp.asarray(motor), jnp.asarray(xyz)
    valid = jnp.ones(n, bool)
    bc, bv, pidx, _ = jax.jit(lambda m, v: partition_gather_sorted(
        m, v, BLOCK_CAP, max_blocks))(motor_d, valid)
    db = dbscan_blocks_dispatch(bc, bv, EPS, MIN_PTS, "l1_motor",
                                chunk=16, backend="jnp")
    fused = jax.jit(lambda l, v, c, p: merge_blocks(
        l, v, c, p, n, EPS, MIN_PTS, "l1_motor", quirks=False,
        noise_capacity=NOISE_CAP))(db["label"], bv, bc, pidx)
    pay = (xyz_d[:, 0], xyz_d[:, 1], motor_d[:, 0], motor_d[:, 1])
    tabs, tval, runs, _ = jax.jit(lambda l, v: bucket_payload_by_cluster(
        l, v, pay, MAX_CLUSTERS, CLUSTER_CAP))(fused["label"], valid)
    both = jnp.concatenate([tabs[..., 0:2], tabs[..., 2:4]], axis=0)
    bval = jnp.concatenate([tval, tval], axis=0)
    bcnt = jnp.concatenate([runs, runs], axis=0)

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

    # full shapes stage, both MEC engines
    f_scan = j(lambda p, v, c: cluster_shapes(
        p, v, c, max_hull=MAX_HULL, chunk_k=2 * MAX_CLUSTERS,
        tri_chunk=2480, mec="scan", backend="jnp"))
    f_eh = j(lambda p, v, c: cluster_shapes(
        p, v, c, max_hull=MAX_HULL, chunk_k=2 * MAX_CLUSTERS, mec="eh", backend="jnp"))
    out_scan = f_scan(both, bval, bcnt)
    out_eh = f_eh(both, bval, bcnt)
    r_s = np.asarray(out_scan["radius"])
    r_e = np.asarray(out_eh["radius"])
    nz = r_s > 0
    rel = float(np.max(np.abs(r_e[nz] - r_s[nz]) / r_s[nz])) if nz.any() \
        else 0.0
    emit(probe="shapes_x2.scan", ms=t(f_scan, both, bval, bcnt))
    emit(probe="shapes_x2.eh", ms=t(f_eh, both, bval, bcnt),
         max_rel_radius_diff=rel,
         n_nonzero=int(nz.sum()))

    # sub-stage split: hull alone, then each MEC over precomputed hulls
    def hulls(p, v):
        def one(pp, vv):
            return convex_hull(pp, vv, MAX_HULL)
        k = p.shape[0]
        return jax.lax.map(
            lambda ab: jax.vmap(one)(*ab),
            (p.reshape(-1, 2 * MAX_CLUSTERS, *p.shape[1:]),
             v.reshape(-1, 2 * MAX_CLUSTERS, v.shape[1])))

    f_h = j(hulls)
    hp, hv = f_h(both, bval)
    hp = hp.reshape(-1, MAX_HULL, 2)
    hv = hv.reshape(-1, MAX_HULL)
    emit(probe="shapes.hull_wrap_only", ms=t(f_h, both, bval))

    f_ms = j(lambda a, b: jax.vmap(
        lambda x, y: min_enclosing_circle(x, y, 2480))(a, b))
    f_me = j(lambda a, b: jax.vmap(min_enclosing_circle_eh)(a, b))
    emit(probe="shapes.mec_scan_only", ms=t(f_ms, hp, hv))
    emit(probe="shapes.mec_eh_only", ms=t(f_me, hp, hv))

    # fused VMEM shapes kernel: hull + MEC + rect on resident data
    from vtkcloudpoint_tpu.ops.pallas.shapes_kernel import (
        cluster_shapes_pallas,
    )

    f_k = j(lambda p, v, c: cluster_shapes_pallas(
        p, v, c, max_hull=MAX_HULL))
    try:
        out_k = f_k(both, bval, bcnt)
        r_k = np.asarray(out_k["radius"])
        relk = float(np.max(np.abs(r_k[nz] - r_s[nz]) / r_s[nz])) if \
            nz.any() else 0.0
        emit(probe="shapes_x2.pallas_kernel", ms=t(f_k, both, bval, bcnt),
             max_rel_radius_diff=relk)
    except Exception as e:  # pragma: no cover
        emit(probe="shapes_x2.pallas_kernel", error=str(e)[:500])

    # Akl-Toussaint prune: m-direction extremes polygon culls interior
    # points before the gift-wrap sweep (width 1024 -> prune_cap)
    for pcap in (128, 192, 256):
        f_p = j(lambda p, v, c, _pc=pcap: cluster_shapes(
            p, v, c, max_hull=MAX_HULL, chunk_k=2 * MAX_CLUSTERS,
            tri_chunk=2480, mec="scan", prune_cap=_pc, backend="jnp"))
        out_p = f_p(both, bval, bcnt)
        r_p = np.asarray(out_p["radius"])
        rel = float(np.max(np.abs(r_p[nz] - r_s[nz]) / r_s[nz])) if \
            nz.any() else 0.0
        emit(probe=f"shapes_x2.scan_prune{pcap}",
             ms=t(f_p, both, bval, bcnt),
             prune_overflow=int(out_p["prune_overflow"]),
             max_rel_radius_diff=rel)


if __name__ == "__main__":
    main()

"""Tier 3 at its DEFINED scale (BASELINE.md config 3): a 5M-point scan,
full clustering pipeline, one real chip.

Round 3 recorded only the NN-crossover study at tier 3; the 5M-point
clustering job itself was never run (VERDICT r3 missing item 2). This is
the headline bench pipeline (Morton blocks -> per-block DBSCAN -> fusion +
noise re-cluster -> centroids -> circumcircles x2 -> ICP-to-truth) at
N = 5e6 with capacities scaled to match: grid-engine noise re-cluster
(the dense [T, T] adjacency would be 4 GB at the 32k noise capacity) and
an 8192-cluster table.

Emits one JSON line per measurement; overflow counters included so a
silently-truncated run cannot masquerade as a record.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BENCH_N", 5_000_000))
BLOCK_CAP = 1024
EPS = 0.004
MIN_PTS = 8
PTS_PER_CLUSTER = 800
NOISE_FRAC = 0.004
NOISE_CAP = 65536
NOISE_CELL_CAP = 64
# headroom over the MEASURED n_total (10463 at this cloud: cross-block
# split pieces 4..cap survive as distinct ids, same semantics as the
# bench) -- ids past the table size would silently lose stats/shapes rows
MAX_CLUSTERS = 12288
CLUSTER_CAP = 1024
MAX_HULL = 32
N_TRUTH = 5120
SHAPE_CHUNK_K = 4096


def emit(**kw):
    print(json.dumps(kw), flush=True)


def cloud(n, seed=3):
    rng = np.random.default_rng(seed)
    k = n // PTS_PER_CLUSTER
    n_noise = int(n * NOISE_FRAC)
    nc = n - n_noise
    centers = rng.uniform(0.01, 0.99, size=(k, 2))
    per = nc // k
    pts = centers[:, None, :] + 0.0008 * rng.standard_normal((k, per, 2))
    parts = [pts.reshape(-1, 2)]
    parts.append(rng.uniform(0, 1, size=(nc - per * k, 2)))
    parts.append(rng.uniform(0, 1, size=(n_noise, 2)))
    motor = np.concatenate(parts)[:n].astype(np.float32)
    xyz = np.concatenate([motor, np.ones((n, 1), np.float32)], axis=1)
    truth = np.concatenate(
        [centers[:N_TRUTH], np.ones((N_TRUTH, 1))], axis=1
    ).astype(np.float32)
    return motor, xyz, truth, k


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jaxcache") + "-dev")
    except Exception:
        pass
    from vtkcloudpoint_tpu.cluster.blocks import partition_gather_sorted
    from vtkcloudpoint_tpu.cluster.dbscan import (
        dbscan_blocks_dispatch, resolve_backend)
    from vtkcloudpoint_tpu.cluster.fusion import merge_blocks
    from vtkcloudpoint_tpu.ops.segment import (
        cluster_stats, bucket_payload_by_cluster)
    from vtkcloudpoint_tpu.ops.geometry import cluster_shapes
    from vtkcloudpoint_tpu.register.icp import icp
    from vtkcloudpoint_tpu.config import ICPConfig

    n = N
    max_blocks = (n + BLOCK_CAP - 1) // BLOCK_CAP
    backend = resolve_backend("auto")
    emit(metric="tier3_config", points=n, blocks=max_blocks,
         eps=EPS, min_pts=MIN_PTS, backend=backend,
         max_clusters=MAX_CLUSTERS, noise_cap=NOISE_CAP,
         platform=jax.devices()[0].platform)

    motor, xyz, truth, k_true = cloud(n)

    def step(motor, xyz, valid, truth, truth_valid):
        bc, bv, pidx, gath_ovf = partition_gather_sorted(
            motor, valid, BLOCK_CAP, max_blocks)
        db = dbscan_blocks_dispatch(bc, bv, EPS, MIN_PTS, "l1_motor",
                                    chunk=16, backend=backend)
        fused = merge_blocks(db["label"], bv, bc, pidx, n, EPS, MIN_PTS,
                             "l1_motor", quirks=False,
                             noise_capacity=NOISE_CAP,
                             noise_engine="auto",
                             noise_cell_cap=NOISE_CELL_CAP)
        label = fused["label"]
        stats = cluster_stats(xyz, motor, label, valid, MAX_CLUSTERS)
        pay = (xyz[:, 0], xyz[:, 1], motor[:, 0], motor[:, 1])
        tabs, tval, runs, bovf = bucket_payload_by_cluster(
            label, valid, pay, MAX_CLUSTERS, CLUSTER_CAP)
        both = jnp.concatenate([tabs[..., 0:2], tabs[..., 2:4]], axis=0)
        bval = jnp.concatenate([tval, tval], axis=0)
        bcnt = jnp.concatenate([runs, runs], axis=0)
        sh = cluster_shapes(both, bval, bcnt, max_hull=MAX_HULL,
                            chunk_k=SHAPE_CHUNK_K)
        centers = stats["center3d"]
        cvalid = stats["count"] > 0
        res = icp(centers, cvalid, truth, truth_valid,
                  ICPConfig(max_iterations=50), chunk=1024,
                  backend=backend)
        # bucket overflow excludes row 0: the noise bucket always exceeds
        # cluster capacity and has no shape anyway
        return (label, fused["n_total"], fused["noise_overflow"],
                gath_ovf[0], jnp.sum(bovf[1:]), sh["radius"][:MAX_CLUSTERS],
                res.error, res.iterations)

    fn = jax.jit(step)
    args = (jnp.asarray(motor), jnp.asarray(xyz), jnp.ones(n, bool),
            jnp.asarray(truth), jnp.ones(len(truth), bool))

    def run_sync():
        out = fn(*args)
        _ = np.asarray(out[0][:16])
        return out

    t0 = time.perf_counter()
    out = run_sync()
    emit(metric="tier3_compile_plus_first_run_s",
         value=round(time.perf_counter() - t0, 1))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_sync()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    emit(metric="tier3_5m_clustering",
         points=n, wall_ms=round(dt * 1e3, 1),
         points_per_sec=round(n / dt, 1),
         n_clusters=int(out[1]), k_true=k_true,
         noise_overflow=int(out[2]), gather_overflow=int(out[3]),
         bucket_overflow_pts=int(out[4]),
         icp_error=round(float(out[6]), 5), icp_iters=int(out[7]),
         backend=backend)


if __name__ == "__main__":
    main()

"""Tier 3 (BASELINE.json config 3): 5M-pt scan, grid-hash neighbor kernels +
multi-start/RANSAC ICP, one host."""
import numpy as np

from common import setup_jax, blob_cloud, timed, emit

N = int(__import__('os').environ.get('BENCH_N', 5_000_000))


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.cluster.grid import dbscan_grid
    from vtkcloudpoint_tpu.ops.segment import cluster_stats
    from vtkcloudpoint_tpu.register.icp import icp_multistart
    from vtkcloudpoint_tpu.config import ICPConfig

    eps, mp = 0.0015, 8
    motor, xyz, truth, centers = blob_cloud(N, k=4000, spread=0.0003, seed=2)
    mj = jnp.asarray(motor)
    valid = jnp.ones(N, bool)

    fn = jax.jit(lambda: dbscan_grid(mj, valid, eps, mp, cell_cap=64))
    dt, out = timed(fn, lambda o: np.asarray(o["label"][:8]))
    pps = N / dt
    emit(metric="tier3_grid_dbscan_points_per_sec", value=round(pps, 1),
         unit="points/sec", wall_ms=round(dt * 1000, 1),
         n_clusters=int(out["n_clusters"]), overflow=int(out["overflow"]))

    stats = cluster_stats(jnp.asarray(xyz), mj, out["label"], valid, 8192)
    cvalid = stats["count"] > 0
    tgt = jnp.asarray(np.concatenate([centers, np.ones((len(centers), 1))],
                                     axis=1).astype(np.float32))
    res = icp_multistart(stats["center3d"], cvalid, tgt,
                         jnp.ones(tgt.shape[0], bool),
                         ICPConfig(num_starts=4, max_iterations=50),
                         key=jax.random.PRNGKey(0), chunk=2048)
    emit(metric="tier3_multistart_icp_error", value=float(res.error),
         iters=int(res.iterations))


if __name__ == "__main__":
    main()

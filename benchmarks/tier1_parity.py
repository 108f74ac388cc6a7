"""Tier 1 (BASELINE.json config 1): ~50k-pt single scan, plain DBSCAN +
centroid ICP to truth. Acceptance: labels bit-identical to the sequential
reference-semantics oracle; registration RMSE ~ 0 on a rigidly-displaced
truth set."""
import numpy as np

from common import setup_jax, blob_cloud, timed, emit

N = int(__import__('os').environ.get('BENCH_N', 50_000))


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.cluster.grid import dbscan_grid
    from vtkcloudpoint_tpu.oracle.dbscan_oracle import dbscan_oracle
    from vtkcloudpoint_tpu.ops.segment import cluster_stats
    from vtkcloudpoint_tpu.register.icp import icp
    from vtkcloudpoint_tpu.register.matching import assign_matches, registration_rmse
    from vtkcloudpoint_tpu.ops import se3
    from vtkcloudpoint_tpu.config import ICPConfig

    eps, mp = 0.004, 8
    motor, xyz, truth, centers = blob_cloud(N, k=400, seed=1)
    mj = jnp.asarray(motor)
    valid = jnp.ones(N, bool)

    # engine labels (grid path == plain DBSCAN semantics)
    def run():
        return dbscan_grid(mj, valid, eps, mp, cell_cap=128)

    dt, out = timed(jax.jit(run, static_argnames=()), lambda o: np.asarray(o["label"][:8]))
    labels = np.asarray(out["label"])

    # oracle parity on a subsample-free exact comparison (float32 coords fed
    # to the float64 oracle for identical eps decisions)
    ref, k_ref, _ = dbscan_oracle(motor.astype(np.float64), eps, mp)
    labels_match = bool((labels == ref).all())

    # centroid ICP to rigidly displaced truth
    stats = cluster_stats(jnp.asarray(xyz), mj, out["label"], valid, 1024)
    r_true = np.asarray(se3.rotz(0.05)).astype(np.float32)
    t_true = np.array([0.1, -0.05, 0.02], np.float32)
    tgt = (np.asarray(stats["center3d"]) @ r_true.T + t_true).astype(np.float32)
    cvalid = stats["count"] > 0
    res = icp(stats["center3d"], cvalid, jnp.asarray(tgt), cvalid,
              ICPConfig(tol=1e-10))
    m = assign_matches(stats["center3d"], cvalid, jnp.asarray(tgt), cvalid,
                       res.r, res.t, 0.01)
    rmse = float(registration_rmse(m, jnp.asarray(tgt)))

    emit(metric="tier1_labels_bit_match", value=labels_match,
         n_clusters=int(out["n_clusters"]), oracle_clusters=k_ref,
         dbscan_ms=round(dt * 1000, 1),
         icp_iters=int(res.iterations), icp_rmse=rmse)
    assert labels_match and rmse < 1e-5


if __name__ == "__main__":
    main()

"""Tier 4 (BASELINE.json config 4): sequential 100-scan trajectory,
ICP odometry + pose-graph optimization + cluster-centroid bundle
adjustment (ATE reported for every stage; BA must not regress the
pose-graph solution)."""
import numpy as np

from common import setup_jax, timed, emit

import os as _os
S = int(_os.environ.get("BENCH_T4_S", 100))
N_PER_SCAN = int(_os.environ.get("BENCH_T4_N", 2048))
N_LANDMARKS = int(_os.environ.get("BENCH_T4_MARKS", 48))


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.config import ICPConfig
    from vtkcloudpoint_tpu.ops import se3
    from vtkcloudpoint_tpu.slam.trajectory import slam_pipeline_ba
    from vtkcloudpoint_tpu.slam.posegraph import absolute_trajectory_error

    rng = np.random.default_rng(0)
    # landmark-structured world (the reference's survey-marker regime,
    # FrmMain.cs:841-907): dense blobs the per-scan DBSCAN can find, plus
    # unstructured background
    marks = rng.uniform(-30, 30, size=(N_LANDMARKS, 3)) * np.array(
        [1, 1, 0.2])
    per = (2 * N_PER_SCAN // 3) // N_LANDMARKS
    blob = (marks[:, None, :]
            + 0.08 * rng.standard_normal((N_LANDMARKS, per, 3))
            ).reshape(-1, 3)
    bg = rng.uniform(-30, 30, size=(N_PER_SCAN - len(blob), 3)) * np.array(
        [1, 1, 0.2])
    world = np.concatenate([blob, bg])
    # drifting loop trajectory
    r_true = [np.eye(3)]
    t_true = [np.zeros(3)]
    for k in range(1, S):
        r_true.append(r_true[-1] @ np.asarray(se3.rotz(2 * np.pi / S)))
        t_true.append(t_true[-1] + r_true[-1] @ np.array([0.5, 0, 0]))
    r_true = np.stack(r_true)
    t_true = np.stack(t_true)
    scans = np.stack([
        ((world - t_true[k]) @ r_true[k]
         + 0.002 * rng.standard_normal((N_PER_SCAN, 3)))
        for k in range(S)
    ]).astype(np.float32)
    valid = np.ones((S, N_PER_SCAN), bool)

    import time
    t0 = time.perf_counter()
    ba, pg, odo, stats = slam_pipeline_ba(
        jnp.asarray(scans), jnp.asarray(valid),
        ICPConfig(max_iterations=30, tol=1e-10),
        loop_radius=3.0, gn_iterations=8,
        landmark_eps=0.5, landmark_min_pts=8,
        max_clusters_per_scan=64, ba_iterations=8)

    def ate(tr):
        return float(absolute_trajectory_error(
            tr.r, tr.t, jnp.asarray(r_true), jnp.asarray(t_true)))

    ate_odo, ate_pg, ate_ba = ate(odo), ate(pg), ate(ba)
    dt = time.perf_counter() - t0
    emit(metric="tier4_slam_ate", value=ate_ba, ate_odometry=ate_odo,
         ate_posegraph=ate_pg, ate_ba=ate_ba,
         n_landmarks=int(stats["n_landmarks"]), scans=S,
         points_per_scan=N_PER_SCAN, wall_s=round(dt, 2),
         graph_cost=float(stats["graph_cost"]),
         ba_cost=float(stats["ba_cost"]))
    # 1e-3 absolute floor: at near-zero drift the stages differ only by
    # estimation noise (landmark centroids carry ~sigma/sqrt(n) error)
    assert ate_pg <= max(ate_odo * 1.05, ate_odo + 1e-3)
    assert ate_ba <= max(ate_pg * 1.05, ate_pg + 1e-3)


if __name__ == "__main__":
    main()

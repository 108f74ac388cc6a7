"""Tier 4 (BASELINE.json config 4): sequential 100-scan trajectory,
scan-to-map ICP odometry + pose-graph optimization."""
import numpy as np

from common import setup_jax, timed, emit

S = 100
N_PER_SCAN = 2048


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.config import ICPConfig
    from vtkcloudpoint_tpu.ops import se3
    from vtkcloudpoint_tpu.slam.trajectory import slam_pipeline
    from vtkcloudpoint_tpu.slam.posegraph import absolute_trajectory_error

    rng = np.random.default_rng(0)
    world = rng.uniform(-30, 30, size=(N_PER_SCAN, 3)) * np.array([1, 1, 0.2])
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

    def run():
        return slam_pipeline(jnp.asarray(scans), jnp.asarray(valid),
                             ICPConfig(max_iterations=30, tol=1e-10),
                             loop_radius=3.0, gn_iterations=8)

    import time
    t0 = time.perf_counter()
    opt, odo, cost = run()
    ate_odo = float(absolute_trajectory_error(
        odo.r, odo.t, jnp.asarray(r_true), jnp.asarray(t_true)))
    ate_opt = float(absolute_trajectory_error(
        opt.r, opt.t, jnp.asarray(r_true), jnp.asarray(t_true)))
    dt = time.perf_counter() - t0
    emit(metric="tier4_slam_ate", value=ate_opt, ate_odometry=ate_odo,
         scans=S, points_per_scan=N_PER_SCAN,
         wall_s=round(dt, 2), graph_cost=float(cost))
    assert ate_opt <= ate_odo * 1.05


if __name__ == "__main__":
    main()

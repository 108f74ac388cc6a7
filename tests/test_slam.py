"""SLAM tier-4: so3 maps, pose-graph GN, odometry + loop-closure pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.config import ICPConfig
from vtkcloudpoint_tpu.ops import se3
from vtkcloudpoint_tpu.slam.posegraph import (
    PoseGraph, optimize_pose_graph, absolute_trajectory_error,
)
from vtkcloudpoint_tpu.slam.trajectory import (
    odometry_chain, detect_loop_closures, slam_pipeline, Trajectory,
)


def test_so3_exp_log_roundtrip(rng):
    for _ in range(10):
        w = rng.standard_normal(3)
        w = w / np.linalg.norm(w) * rng.uniform(0.01, 3.0)
        r = se3.so3_exp(jnp.asarray(w))
        w2 = se3.so3_log(r)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-9)
    # small-angle branch
    w = np.array([1e-9, -2e-9, 1e-9])
    np.testing.assert_allclose(np.asarray(se3.so3_log(se3.so3_exp(jnp.asarray(w)))),
                               w, atol=1e-12)


def make_loop_trajectory(s, rng, step=1.0, turn=None):
    """Loop of s poses turning ``turn`` rad per step (default closes a full
    circle)."""
    turn = 2 * np.pi / s if turn is None else turn
    r_true = [np.eye(3)]
    t_true = [np.zeros(3)]
    for k in range(1, s):
        r_true.append(np.asarray(r_true[-1] @ np.asarray(se3.rotz(turn))))
        t_true.append(t_true[-1] + r_true[-1] @ np.array([step, 0, 0]))
    return np.stack(r_true), np.stack(t_true)


def test_posegraph_recovers_noisy_odometry(rng):
    s = 20
    r_true, t_true = make_loop_trajectory(s, rng)
    # noisy odometry edges + exact loop closure (first-last)
    ei, ej, rm, tm, w = [], [], [], [], []
    for k in range(s - 1):
        r_rel = r_true[k].T @ r_true[k + 1]
        t_rel = r_true[k].T @ (t_true[k + 1] - t_true[k])
        noise_r = np.asarray(se3.so3_exp(jnp.asarray(0.02 * rng.standard_normal(3))))
        ei.append(k); ej.append(k + 1)
        rm.append(r_rel @ noise_r); tm.append(t_rel + 0.05 * rng.standard_normal(3))
        w.append(1.0)
    # strong exact closure 0 -> s-1
    r_rel = r_true[0].T @ r_true[s - 1]
    t_rel = r_true[0].T @ (t_true[s - 1] - t_true[0])
    ei.append(0); ej.append(s - 1); rm.append(r_rel); tm.append(t_rel); w.append(100.0)

    graph = PoseGraph(jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
                      jnp.asarray(np.stack(rm)), jnp.asarray(np.stack(tm)),
                      jnp.asarray(w))
    # initial: integrate noisy odometry
    r0 = [r_true[0]]; t0 = [t_true[0]]
    for k in range(s - 1):
        r0.append(r0[-1] @ rm[k])
        t0.append(r0[-2] @ tm[k] + t0[-1])
    r0 = jnp.asarray(np.stack(r0)); t0 = jnp.asarray(np.stack(t0))

    ate_before = float(absolute_trajectory_error(
        r0, t0, jnp.asarray(r_true), jnp.asarray(t_true)))
    r_opt, t_opt, cost = optimize_pose_graph(r0, t0, graph, iterations=15,
                                             damping=1e-6)
    ate_after = float(absolute_trajectory_error(
        r_opt, t_opt, jnp.asarray(r_true), jnp.asarray(t_true)))
    assert ate_after < ate_before * 0.6, (ate_before, ate_after)


def test_posegraph_exact_measurements_zero_cost(rng):
    s = 10
    r_true, t_true = make_loop_trajectory(s, rng)
    ei, ej, rm, tm = [], [], [], []
    for k in range(s - 1):
        ei.append(k); ej.append(k + 1)
        rm.append(r_true[k].T @ r_true[k + 1])
        tm.append(r_true[k].T @ (t_true[k + 1] - t_true[k]))
    graph = PoseGraph(jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
                      jnp.asarray(np.stack(rm)), jnp.asarray(np.stack(tm)),
                      jnp.ones(s - 1))
    r_opt, t_opt, cost = optimize_pose_graph(
        jnp.asarray(r_true), jnp.asarray(t_true), graph, iterations=3)
    assert float(cost) < 1e-18
    np.testing.assert_allclose(np.asarray(t_opt), t_true, atol=1e-8)


def make_scans(s, n, rng):
    """One static structured cloud observed from s drifting poses: scan_k =
    world points in scan_k frame. Inter-scan motion is small (0.1 rad),
    matching the sequential-scan regime ICP odometry assumes."""
    world = rng.uniform(-4, 4, size=(n, 3)) * np.array([1, 1, 0.3])
    r_true, t_true = make_loop_trajectory(s, rng, step=0.4, turn=0.1)
    scans = np.stack([(world - t_true[k]) @ r_true[k] for k in range(s)])
    return scans.astype(np.float64), r_true, t_true


def test_odometry_chain_recovers_poses(rng):
    s, n = 6, 120
    scans, r_true, t_true = make_scans(s, n, rng)
    valid = np.ones((s, n), bool)
    (r_rel, t_rel), traj = odometry_chain(jnp.asarray(scans), jnp.asarray(valid),
                                          ICPConfig(tol=1e-14))
    np.testing.assert_allclose(np.asarray(traj.t), t_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj.r), r_true, atol=1e-5)


def test_slam_pipeline_end_to_end(rng):
    s, n = 8, 100
    scans, r_true, t_true = make_scans(s, n, rng)
    valid = np.ones((s, n), bool)
    opt, odo, cost = slam_pipeline(jnp.asarray(scans), jnp.asarray(valid),
                                   ICPConfig(tol=1e-14), loop_radius=10.0,
                                   gn_iterations=5)
    ate = float(absolute_trajectory_error(opt.r, opt.t, jnp.asarray(r_true),
                                          jnp.asarray(t_true)))
    assert ate < 1e-4, ate


def test_voxel_downsample(rng):
    from vtkcloudpoint_tpu.ops.voxel import voxel_downsample
    # two tight groups of points -> two voxels at their means
    a = np.array([1.05, 1.05, 0.25]) + 0.01 * rng.standard_normal((20, 3))
    b = np.array([5.05, 5.05, 0.25]) + 0.01 * rng.standard_normal((30, 3))
    xyz = np.concatenate([a, b])
    pts, mask, nv = voxel_downsample(jnp.asarray(xyz), jnp.ones(50, bool),
                                     voxel_size=0.5, table_size=256)
    assert int(nv) == 2
    got = np.sort(np.asarray(pts)[np.asarray(mask)], axis=0)
    want = np.sort(np.stack([a.mean(0), b.mean(0)]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_scan_to_map_recovers_trajectory(rng):
    from vtkcloudpoint_tpu.slam.scan2map import scan_to_map
    s, n = 6, 150
    scans, r_true, t_true = make_scans(s, n, rng)
    valid = np.ones((s, n), bool)
    traj, mapstate, errs = scan_to_map(jnp.asarray(scans), jnp.asarray(valid),
                                       ICPConfig(tol=1e-14),
                                       voxel_size=0.05, map_capacity=4096)
    # map points are voxel means, so recovery is voxel-accuracy: the
    # registered scan's points average into their voxels and shift targets
    # by O(voxel) -- assert well under half a voxel
    np.testing.assert_allclose(np.asarray(traj.t), t_true, atol=0.02)
    np.testing.assert_allclose(np.asarray(traj.r), r_true, atol=0.02)
    # errors should not blow up over the sequence (drift resistance)
    e = np.asarray(errs)
    assert e[-1] < 10 * max(e[0], 1e-12) + 1e-6


def test_slam_checkpoint_kill_resume(rng, tmp_path):
    """Kill-and-resume reproduces the uninterrupted trajectory bit-for-bit
    (VERDICT r1 item 9)."""
    from vtkcloudpoint_tpu.slam.trajectory import slam_pipeline_checkpointed

    s, n = 8, 100
    scans, r_true, t_true = make_scans(s, n, rng)
    valid = np.ones((s, n), bool)
    cfg = ICPConfig(tol=1e-14)
    kw = dict(icp_cfg=cfg, every=3, loop_radius=10.0, gn_iterations=5)

    # uninterrupted run
    full = slam_pipeline_checkpointed(
        jnp.asarray(scans), jnp.asarray(valid), str(tmp_path / "a"), **kw)
    assert full is not None

    # interrupted after ONE chunk (3 of 7 pairs), then resumed
    partial = slam_pipeline_checkpointed(
        jnp.asarray(scans), jnp.asarray(valid), str(tmp_path / "b"),
        max_chunks=1, **kw)
    assert partial is None  # interrupted
    resumed = slam_pipeline_checkpointed(
        jnp.asarray(scans), jnp.asarray(valid), str(tmp_path / "b"), **kw)
    assert resumed is not None
    np.testing.assert_array_equal(np.asarray(resumed[0].r),
                                  np.asarray(full[0].r))
    np.testing.assert_array_equal(np.asarray(resumed[0].t),
                                  np.asarray(full[0].t))


def test_scan_to_map_grid_nn_matches_brute(rng):
    """Grid-hash correspondence inside scan-to-map equals the brute path
    (VERDICT r1 item 2: same transforms, large-target locator)."""
    from vtkcloudpoint_tpu.slam.scan2map import scan_to_map
    s, n = 5, 150
    scans, r_true, t_true = make_scans(s, n, rng)
    valid = np.ones((s, n), bool)
    kw = dict(cfg=ICPConfig(tol=1e-14), voxel_size=0.05, map_capacity=4096)
    tb, _, _ = scan_to_map(jnp.asarray(scans), jnp.asarray(valid),
                           nn="brute", **kw)
    tg, _, _ = scan_to_map(jnp.asarray(scans), jnp.asarray(valid),
                           nn="grid", grid_fallback_cap=n, **kw)
    np.testing.assert_allclose(np.asarray(tg.t), np.asarray(tb.t),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tg.r), np.asarray(tb.r),
                               atol=1e-6)


def test_slam_pipeline_ba_refines(rng):
    """Landmark BA wired end-to-end (VERDICT r2 item 6): per-scan cluster
    centroids -> Observations -> Schur BA; must not regress the pose-graph
    ATE and should associate one landmark per physical marker."""
    from vtkcloudpoint_tpu.slam.trajectory import slam_pipeline_ba
    from vtkcloudpoint_tpu.slam.posegraph import absolute_trajectory_error

    s, n, n_marks = 24, 600, 10
    r_true, t_true = make_loop_trajectory(s, rng, step=0.5)
    marks = rng.uniform(-6, 6, size=(n_marks, 3)) * np.array([1, 1, 0.2])
    per = (2 * n // 3) // n_marks
    blob = (marks[:, None, :]
            + 0.05 * rng.standard_normal((n_marks, per, 3))).reshape(-1, 3)
    bg = rng.uniform(-6, 6, size=(n - len(blob), 3)) * np.array([1, 1, 0.2])
    world = np.concatenate([blob, bg])
    scans = np.stack([
        (world - t_true[k]) @ r_true[k]
        + 0.01 * rng.standard_normal((n, 3))
        for k in range(s)
    ])
    valid = np.ones((s, n), bool)
    # loop_radius ~0: NO loop closures, so the pose graph keeps the raw
    # odometry drift -- the BA stage alone must recover it through
    # landmarks re-observed across the loop (the marker-survey use case)
    ba, pg, odo, stats = slam_pipeline_ba(
        jnp.asarray(scans), jnp.asarray(valid),
        ICPConfig(max_iterations=25, tol=1e-10), loop_radius=1e-3,
        gn_iterations=6, landmark_eps=0.3, landmark_min_pts=8,
        max_clusters_per_scan=24, ba_iterations=6)

    def ate(tr):
        return float(absolute_trajectory_error(
            tr.r, tr.t, jnp.asarray(r_true), jnp.asarray(t_true)))

    assert ate(pg) <= ate(odo) * 1.05
    # BA must measurably beat the drifting pose-graph-only solution
    assert ate(ba) <= ate(pg) * 0.7
    assert int(stats["n_landmarks"]) >= n_marks // 2

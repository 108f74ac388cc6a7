"""Block-sparse / distributed bundle adjustment (VERDICT r1 item 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.ops import se3
from vtkcloudpoint_tpu.slam.posegraph import PoseGraph, optimize_pose_graph
from vtkcloudpoint_tpu.slam.ba import (
    optimize_pose_graph_sparse, optimize_pose_graph_sharded,
    Observations, bundle_adjust, bundle_adjust_sharded,
)
from vtkcloudpoint_tpu.parallel.mesh import make_mesh


@pytest.fixture
def mesh8():
    return make_mesh(8)


def _make_problem(s=12, seed=0):
    """Noisy circular trajectory + odometry & loop edges measured from the
    TRUE poses; returns (true poses, noisy init, graph)."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, s, endpoint=False)
    r_true = np.stack([np.asarray(se3.rotz(t)) for t in th]).astype(np.float64)
    t_true = np.stack([5 * np.cos(th), 5 * np.sin(th),
                       0.1 * th], axis=1).astype(np.float64)

    ei = list(range(s - 1)) + [0]
    ej = list(range(1, s)) + [s - 1]
    rm, tm = [], []
    for i, j in zip(ei, ej):
        rm.append(r_true[i].T @ r_true[j])
        tm.append(r_true[i].T @ (t_true[j] - t_true[i]))
    graph = PoseGraph(
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        r_meas=jnp.asarray(np.stack(rm)),
        t_meas=jnp.asarray(np.stack(tm)),
        weight=jnp.ones(len(ei)),
    )
    r0 = np.stack([
        r_true[k] @ np.asarray(se3.so3_exp(
            jnp.asarray(0.05 * rng.standard_normal(3))))
        for k in range(s)
    ])
    r0[0] = r_true[0]
    t0 = t_true + 0.2 * rng.standard_normal((s, 3))
    t0[0] = t_true[0]
    return (r_true, t_true), (jnp.asarray(r0), jnp.asarray(t0)), graph


def test_sparse_matches_dense_posegraph():
    (_, _), (r0, t0), graph = _make_problem()
    rd, td, cd = optimize_pose_graph(r0, t0, graph, iterations=8)
    rs, ts, cs = optimize_pose_graph_sparse(r0, t0, graph, iterations=8)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rd), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(td), atol=1e-5)
    assert float(cs) <= float(cd) * 1.01 + 1e-9


def test_sparse_recovers_truth():
    (r_true, t_true), (r0, t0), graph = _make_problem()
    rs, ts, cost = optimize_pose_graph_sparse(r0, t0, graph, iterations=12)
    assert float(cost) < 1e-8
    np.testing.assert_allclose(np.asarray(ts), t_true, atol=1e-3)


def test_sharded_matches_single(mesh8):
    (_, _), (r0, t0), graph = _make_problem()
    rs, ts, cs = optimize_pose_graph_sparse(r0, t0, graph, iterations=8)
    rm_, tm_, cm = optimize_pose_graph_sharded(mesh8, r0, t0, graph,
                                               iterations=8)
    np.testing.assert_allclose(np.asarray(rm_), np.asarray(rs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tm_), np.asarray(ts), atol=1e-5)


def _make_ba_problem(s=6, nl=20, n_obs_per=8, seed=1):
    rng = np.random.default_rng(seed)
    th = np.linspace(0, np.pi, s)
    r_true = np.stack([np.asarray(se3.rotz(t)) for t in th])
    t_true = np.stack([3 * np.cos(th), 3 * np.sin(th), 0 * th], axis=1)
    lms = rng.uniform(-4, 4, (nl, 3))
    pose_idx, lm_idx, zs = [], [], []
    for p in range(s):
        seen = rng.choice(nl, n_obs_per, replace=False)
        for l in seen:
            pose_idx.append(p)
            lm_idx.append(l)
            zs.append(r_true[p].T @ (lms[l] - t_true[p]))
    obs = Observations(
        pose=jnp.asarray(pose_idx, jnp.int32),
        lm=jnp.asarray(lm_idx, jnp.int32),
        z=jnp.asarray(np.stack(zs)),
        weight=jnp.ones(len(zs)),
    )
    r0 = np.stack([
        r_true[k] @ np.asarray(se3.so3_exp(
            jnp.asarray(0.03 * rng.standard_normal(3))))
        for k in range(s)
    ])
    r0[0] = r_true[0]
    t0 = t_true + 0.1 * rng.standard_normal((s, 3))
    t0[0] = t_true[0]
    lms0 = lms + 0.1 * rng.standard_normal((nl, 3))
    return (r_true, t_true, lms), (jnp.asarray(r0), jnp.asarray(t0),
                                   jnp.asarray(lms0)), obs


def test_bundle_adjust_converges():
    (r_true, t_true, lms_true), (r0, t0, l0), obs = _make_ba_problem()
    r, t, l, cost = bundle_adjust(r0, t0, l0, obs, iterations=15,
                                  damping=1e-6)
    assert float(cost) < 1e-9
    # gauge: pose 0 pinned, so poses/landmarks recover absolutely --
    # but only landmarks that were actually observed are determined
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
    seen = np.zeros(len(lms_true), bool)
    seen[np.asarray(obs.lm)] = True
    np.testing.assert_allclose(np.asarray(l)[seen], lms_true[seen],
                               atol=1e-3)


def test_bundle_adjust_sharded_matches(mesh8):
    _, (r0, t0, l0), obs = _make_ba_problem()
    r1, t1, l1, c1 = bundle_adjust(r0, t0, l0, obs, iterations=10,
                                   damping=1e-6)
    r2, t2, l2, c2 = bundle_adjust_sharded(mesh8, r0, t0, l0, obs,
                                           iterations=10, damping=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=1e-5)

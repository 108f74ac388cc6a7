"""ICP: closed-form solve exactness, rigid recovery, convergence, matching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.config import ICPConfig
from vtkcloudpoint_tpu.ops import se3
from vtkcloudpoint_tpu.register.icp import icp, icp_multistart, nn_correspond
from vtkcloudpoint_tpu.register.matching import assign_matches, registration_rmse


def random_rigid(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    r = np.asarray(se3.quat_to_rot(jnp.asarray(q)))
    t = rng.standard_normal(3)
    return r, t


@pytest.mark.parametrize("solver", ["horn", "kabsch"])
@pytest.mark.parametrize("seed", range(3))
def test_closed_form_exact_recovery(solver, seed):
    """With exact correspondences, one solve recovers (R, t) to machine eps."""
    rng = np.random.default_rng(seed)
    p = rng.standard_normal((50, 3))
    r_true, t_true = random_rigid(rng)
    y = p @ r_true.T + t_true
    fn = se3.horn_solve if solver == "horn" else se3.kabsch_solve
    r, t = fn(jnp.asarray(p), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-10)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-10)


def test_weighted_solve_ignores_masked(rng):
    p = rng.standard_normal((40, 3))
    r_true, t_true = random_rigid(rng)
    y = p @ r_true.T + t_true
    # corrupt 10 masked-out pairs
    y_bad = y.copy()
    y_bad[30:] += 100.0
    w = np.zeros(40)
    w[:30] = 1.0
    r, t = se3.horn_solve(jnp.asarray(p), jnp.asarray(y_bad), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-10)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-10)


def test_nn_correspond(rng):
    ref = rng.standard_normal((100, 3))
    q = ref[[5, 17, 93]] + 1e-6
    valid = np.ones(100, bool)
    idx, d2 = nn_correspond(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(idx), [5, 17, 93])
    # masked-out nearest: falls back to next nearest
    valid[5] = False
    idx, _ = nn_correspond(jnp.asarray(q[:1]), jnp.asarray(ref), jnp.asarray(valid))
    assert int(idx[0]) != 5


def test_nn_correspond_chunked_equals_direct(rng):
    ref = rng.standard_normal((70, 3))
    q = rng.standard_normal((130, 3))
    v = np.ones(70, bool)
    i1, d1 = nn_correspond(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(v), chunk=32)
    i2, d2 = nn_correspond(jnp.asarray(q), jnp.asarray(ref), jnp.asarray(v), chunk=4096)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-12)


@pytest.mark.parametrize("seed", range(3))
def test_icp_recovers_small_perturbation(seed):
    """Same point set under a modest rigid motion: ICP drives error to ~0 and
    recovers the transform (the reference tier-1 acceptance)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(80, 3)) * np.array([5, 5, 1])
    ang = 0.15
    r_true = np.asarray(se3.rotz(ang))
    t_true = np.array([0.3, -0.2, 0.1])
    target = pts @ r_true.T + t_true
    v = np.ones(80, bool)
    res = icp(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(target), jnp.asarray(v),
              ICPConfig(tol=1e-12))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.r), r_true, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.t), t_true, atol=1e-6)
    assert float(res.error) < 1e-10


def test_icp_iteration_cap():
    rng = np.random.default_rng(7)
    pts = rng.standard_normal((30, 3))
    target = rng.standard_normal((30, 3))  # unrelated: won't converge to 0
    v = np.ones(30, bool)
    res = icp(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(target), jnp.asarray(v),
              ICPConfig(max_iterations=5, tol=0.0))
    assert int(res.iterations) <= 5


def test_icp_padding_invariance(rng):
    pts = rng.uniform(-1, 1, size=(40, 3))
    r_true = np.asarray(se3.rotz(0.1))
    target = pts @ r_true.T + 0.05
    src = np.zeros((64, 3))
    src[:40] = pts
    sv = np.zeros(64, bool)
    sv[:40] = True
    tgt = np.zeros((50, 3))
    tgt[:40] = target
    tv = np.zeros(50, bool)
    tv[:40] = True
    res_pad = icp(jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt), jnp.asarray(tv),
                  ICPConfig(tol=1e-12))
    res_raw = icp(jnp.asarray(pts), jnp.asarray(np.ones(40, bool)),
                  jnp.asarray(target), jnp.asarray(np.ones(40, bool)),
                  ICPConfig(tol=1e-12))
    np.testing.assert_allclose(np.asarray(res_pad.r), np.asarray(res_raw.r), atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_pad.t), np.asarray(res_raw.t), atol=1e-8)


def test_multistart_escapes_large_rotation():
    """180-degree in-plane rotation defeats single-start ICP on an asymmetric
    cloud; multi-start recovers it (README local-minimum failure mode)."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 1, size=(60, 3)) * np.array([4, 1, 0.5])
    pts[:20] += np.array([3.0, 2.0, 0])  # asymmetry
    r_true = np.asarray(se3.rotz(np.pi * 0.9))
    target = pts @ r_true.T + np.array([1.0, 2.0, 0.0])
    v = np.ones(60, bool)
    single = icp(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(target), jnp.asarray(v),
                 ICPConfig(tol=1e-12))
    multi = icp_multistart(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(target),
                           jnp.asarray(v),
                           ICPConfig(tol=1e-12, num_starts=8),
                           key=jax.random.PRNGKey(0))
    assert float(multi.error) < 1e-8
    assert float(multi.error) <= float(single.error) + 1e-12


def test_assign_matches_threshold(rng):
    truth = rng.uniform(0, 10, size=(20, 3))
    centers = truth[:15] + 0.01  # 15 near-matches
    centers = np.concatenate([centers, rng.uniform(50, 60, size=(5, 3))])
    cv = np.ones(20, bool)
    tv = np.ones(20, bool)
    out = assign_matches(jnp.asarray(centers), jnp.asarray(cv), jnp.asarray(truth),
                         jnp.asarray(tv), jnp.eye(3), jnp.zeros(3), 0.1)
    assert int(out["n_matched"]) == 15
    np.testing.assert_array_equal(np.asarray(out["match_idx"][:15]), np.arange(15))
    rmse = float(registration_rmse(out, jnp.asarray(truth)))
    assert np.isclose(rmse, np.sqrt(3 * 0.01**2), rtol=1e-6)


def test_ransac_init_recovers_large_rotation():
    """RANSAC handles a rotation that defeats plain ICP (tier-3 capability)."""
    from vtkcloudpoint_tpu.register.icp import icp_ransac, ransac_init
    from vtkcloudpoint_tpu.config import ICPConfig
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, size=(50, 3)) * np.array([4, 1, 0.0])
    pts[:15] += np.array([2.0, 3.0, 0])
    r_true = np.asarray(se3.rotz(2.5))
    target = pts @ r_true.T + np.array([-1.0, 2.0, 0.0])
    v = np.ones(50, bool)
    cfg = ICPConfig(tol=1e-12, ransac_iters=128,
                    ransac_inlier_threshold=0.05)
    res = icp_ransac(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(target),
                     jnp.asarray(v), cfg, key=jax.random.PRNGKey(1))
    assert float(res.error) < 1e-8
    np.testing.assert_allclose(np.asarray(res.r), r_true, atol=1e-5)

"""Shape analytics vs independent NumPy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.ops.geometry import (
    convex_hull, min_enclosing_circle, min_area_rect, cluster_shapes,
)
from vtkcloudpoint_tpu.oracle.geometry_oracle import (
    hull_monotone_chain, mec_bruteforce, min_area_rect_bruteforce,
)


def pad(pts, cap):
    out = np.zeros((cap, 2))
    out[: len(pts)] = pts
    v = np.zeros(cap, bool)
    v[: len(pts)] = True
    return jnp.asarray(out), jnp.asarray(v)


@pytest.mark.parametrize("seed", range(6))
def test_hull_contains_extremes(seed):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((40, 2))
    p, v = pad(pts, 64)
    hp, hv = convex_hull(p, v, max_hull=48)
    hull_set = {tuple(np.round(q, 12)) for q in np.asarray(hp)[np.asarray(hv)]}
    want = hull_monotone_chain(pts)
    for q in want:
        assert tuple(np.round(q, 12)) in hull_set, "extreme point missing from hull"


@pytest.mark.parametrize("seed", range(6))
def test_mec_matches_oracle(seed):
    rng = np.random.default_rng(10 + seed)
    pts = rng.standard_normal((30, 2)) * rng.uniform(0.5, 3)
    p, v = pad(pts, 32)
    hp, hv = convex_hull(p, v, max_hull=32)
    cx, cy, r = min_enclosing_circle(hp, hv)
    ocx, ocy, orr = mec_bruteforce(pts)
    assert np.isclose(float(r), orr, rtol=1e-9)
    assert np.isclose(float(cx), ocx, atol=1e-8)
    assert np.isclose(float(cy), ocy, atol=1e-8)


def test_mec_two_points():
    pts = np.array([[0.0, 0.0], [2.0, 0.0]])
    p, v = pad(pts, 8)
    hp, hv = convex_hull(p, v, max_hull=8)
    cx, cy, r = min_enclosing_circle(hp, hv)
    assert np.isclose(float(r), 1.0)
    assert np.isclose(float(cx), 1.0) and np.isclose(float(cy), 0.0)


def test_mec_obtuse_triangle():
    """Obtuse triangle: MEC is the diameter circle of the long side."""
    pts = np.array([[0.0, 0.0], [4.0, 0.0], [1.0, 0.5]])
    p, v = pad(pts, 8)
    hp, hv = convex_hull(p, v, max_hull=8)
    cx, cy, r = min_enclosing_circle(hp, hv)
    assert np.isclose(float(r), 2.0)


@pytest.mark.parametrize("seed", range(5))
def test_min_rect_matches_oracle(seed):
    rng = np.random.default_rng(20 + seed)
    pts = rng.standard_normal((25, 2)) @ np.array([[2.0, 0.7], [0.1, 0.4]])
    p, v = pad(pts, 32)
    hp, hv = convex_hull(p, v, max_hull=32)
    l0, l1, area = min_area_rect(hp, hv)
    o0, o1, oarea = min_area_rect_bruteforce(pts)
    assert np.isclose(float(area), oarea, rtol=1e-9)
    assert np.isclose(float(l0), o0, rtol=1e-9)
    assert np.isclose(float(l1), o1, rtol=1e-9)


def test_cluster_shapes_batch_and_min_points():
    rng = np.random.default_rng(42)
    K, cap = 3, 32
    points = np.zeros((K, cap, 2))
    valid = np.zeros((K, cap), bool)
    counts = np.zeros(K, np.int32)
    clouds = []
    for k, n in enumerate([20, 3, 12]):  # cluster 1 has only 3 points
        pts = rng.standard_normal((n, 2)) + 5 * k
        points[k, :n] = pts
        valid[k, :n] = True
        counts[k] = n
        clouds.append(pts)
    out = cluster_shapes(jnp.asarray(points), jnp.asarray(valid),
                         jnp.asarray(counts), max_hull=32, min_points=4)
    r = np.asarray(out["radius"])
    # cluster with <= 3 points skipped (Tools.cs:400-401)
    assert r[1] == 0.0
    for k in (0, 2):
        _, _, orr = mec_bruteforce(clouds[k])
        assert np.isclose(r[k], orr, rtol=1e-9)
    a = np.asarray(out["aspect"])
    assert a[1] == 0.0 and (a[[0, 2]] >= 1.0).all()

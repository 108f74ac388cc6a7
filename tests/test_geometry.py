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


@pytest.mark.parametrize("seed", range(8))
def test_mec_eh_matches_scan(seed):
    """Elzinga-Hearn support iteration == the C(h,3) triple scan: the MEC
    is unique and both build it from the same defining points."""
    from vtkcloudpoint_tpu.ops.geometry import min_enclosing_circle_eh

    rng = np.random.default_rng(30 + seed)
    n = int(rng.integers(2, 30))
    pts = rng.standard_normal((n, 2)) * rng.uniform(0.5, 3)
    p, v = pad(pts, 32)
    hp, hv = convex_hull(p, v, max_hull=32)
    cx, cy, r = min_enclosing_circle(hp, hv)
    ex, ey, er = min_enclosing_circle_eh(hp, hv)
    assert np.isclose(float(er), float(r), rtol=1e-12)
    assert np.isclose(float(ex), float(cx), atol=1e-10)
    assert np.isclose(float(ey), float(cy), atol=1e-10)


def test_mec_eh_degenerate_cases():
    from vtkcloudpoint_tpu.ops.geometry import min_enclosing_circle_eh

    # single point -> radius 0 (fewer than 2 valid)
    p, v = pad(np.array([[1.0, 2.0]]), 8)
    hp, hv = convex_hull(p, v, max_hull=8)
    assert float(min_enclosing_circle_eh(hp, hv)[2]) == 0.0
    # collinear points -> diameter circle of the extremes
    pts = np.stack([np.linspace(0, 4, 7), np.zeros(7)], axis=1)
    p, v = pad(pts, 8)
    hp, hv = convex_hull(p, v, max_hull=8)
    ex, ey, er = min_enclosing_circle_eh(hp, hv)
    assert np.isclose(float(er), 2.0) and np.isclose(float(ex), 2.0)
    # obtuse triangle -> long-side diameter circle
    pts = np.array([[0.0, 0.0], [4.0, 0.0], [1.0, 0.5]])
    p, v = pad(pts, 8)
    hp, hv = convex_hull(p, v, max_hull=8)
    assert np.isclose(float(min_enclosing_circle_eh(hp, hv)[2]), 2.0)


def test_cluster_shapes_mec_engines_agree():
    from vtkcloudpoint_tpu.ops.geometry import cluster_shapes as cs

    rng = np.random.default_rng(9)
    K, cap = 16, 64
    points = np.zeros((K, cap, 2))
    valid = np.zeros((K, cap), bool)
    counts = np.zeros(K, np.int32)
    for k in range(K):
        n = int(rng.integers(4, cap))
        points[k, :n] = rng.standard_normal((n, 2)) + 3 * k
        valid[k, :n] = True
        counts[k] = n
    a = cs(jnp.asarray(points), jnp.asarray(valid), jnp.asarray(counts),
           max_hull=32, mec="eh")
    b = cs(jnp.asarray(points), jnp.asarray(valid), jnp.asarray(counts),
           max_hull=32, mec="scan")
    np.testing.assert_allclose(np.asarray(a["radius"]),
                               np.asarray(b["radius"]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a["rect_area"]),
                               np.asarray(b["rect_area"]), rtol=1e-10)


@pytest.mark.parametrize("seed", range(6))
def test_hull_prune_pack_exact(seed):
    """Akl-Toussaint pruning never loses a hull vertex: shapes with
    prune_cap match the unpruned ones exactly."""
    from vtkcloudpoint_tpu.ops.geometry import cluster_shapes as cs

    rng = np.random.default_rng(50 + seed)
    K, cap = 8, 256
    points = np.zeros((K, cap, 2))
    valid = np.zeros((K, cap), bool)
    counts = np.zeros(K, np.int32)
    for k in range(K):
        n = int(rng.integers(4, cap))
        if k == 0:            # collinear: degenerate m-gon, nothing pruned
            points[k, :n, 0] = np.linspace(0, 1, n)
        else:
            points[k, :n] = rng.standard_normal((n, 2)) + 3 * k
        valid[k, :n] = True
        counts[k] = n
    b = cs(jnp.asarray(points), jnp.asarray(valid), jnp.asarray(counts),
           max_hull=32, prune_cap=0)
    # cap == full width: nothing can drop, even the unprunable collinear
    # cluster -- equality must be exact
    a = cs(jnp.asarray(points), jnp.asarray(valid), jnp.asarray(counts),
           max_hull=32, prune_cap=cap)
    assert int(a["prune_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(a["radius"]),
                               np.asarray(b["radius"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["rect_area"]),
                               np.asarray(b["rect_area"]), rtol=1e-12)
    # gaussian clusters at a tight cap: the 16-gon prune keeps few
    # survivors; exactness must hold whenever overflow == 0
    g = slice(1, K)
    c = cs(jnp.asarray(points[g]), jnp.asarray(valid[g]),
           jnp.asarray(counts[g]), max_hull=32, prune_cap=96)
    assert int(c["prune_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(c["radius"]),
                               np.asarray(b["radius"])[g], rtol=1e-12)


def test_hull_prune_pack_overflow_surfaces():
    from vtkcloudpoint_tpu.ops.geometry import hull_prune_pack

    pts = np.stack([np.linspace(0, 1, 64), np.zeros(64)], axis=1)
    out, sel, ovf = hull_prune_pack(jnp.asarray(pts),
                                    jnp.ones(64, bool), 16)
    # collinear: nothing prunable, 64 survivors > 16 slots
    assert int(ovf) == 48

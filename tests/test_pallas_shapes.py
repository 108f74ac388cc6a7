"""Fused VMEM shapes kernel vs the XLA pipeline (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.ops.geometry import cluster_shapes
from vtkcloudpoint_tpu.ops.pallas.shapes_kernel import cluster_shapes_pallas


def _clusters(seed, K=12, cap=128):
    rng = np.random.default_rng(seed)
    points = np.zeros((K, cap, 2), np.float32)
    valid = np.zeros((K, cap), bool)
    counts = np.zeros(K, np.int32)
    for k in range(K):
        n = int(rng.integers(2, cap))
        if k % 5 == 1:      # collinear
            points[k, :n, 0] = np.linspace(0, 1, n)
            points[k, :n, 1] = 0.5
        elif k % 5 == 2:    # two points
            n = 2
            points[k, :n] = [[0.1, 0.2], [0.7, 0.9]]
        else:
            points[k, :n] = (rng.uniform(0.1, 0.9, 2)
                             + 0.05 * rng.standard_normal((n, 2)))
        valid[k, :n] = True
        counts[k] = n
    return points, valid, counts


@pytest.mark.parametrize("seed", range(4))
def test_shapes_kernel_matches_xla(seed):
    points, valid, counts = _clusters(seed)
    ref = cluster_shapes(jnp.asarray(points), jnp.asarray(valid),
                         jnp.asarray(counts), max_hull=32, chunk_k=12,
                         backend="jnp")
    out = cluster_shapes_pallas(jnp.asarray(points), jnp.asarray(valid),
                                jnp.asarray(counts), max_hull=32)
    for key in ("radius", "rect_area", "center_x", "center_y"):
        a = np.asarray(ref[key], np.float64)
        b = np.asarray(out[key], np.float64)
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6,
                                   err_msg=key)
    # the l0/l1 SPLIT can differ on near-tie minimal rectangles (two
    # edges with equal area, different orientation -- last-ulp summation
    # differences flip the winner; same caveat as hull="quick"). The
    # rectangle itself must still be consistent: l0 >= l1, l0*l1 == area.
    l0 = np.asarray(out["rect_len0"], np.float64)
    l1 = np.asarray(out["rect_len1"], np.float64)
    area = np.asarray(out["rect_area"], np.float64)
    assert (l0 >= l1).all() and (l1 >= 0).all()
    np.testing.assert_allclose(l0 * l1, area, rtol=1e-5, atol=1e-9)
    matches = np.isclose(l0, np.asarray(ref["rect_len0"], np.float64),
                         rtol=2e-5, atol=1e-6)
    assert matches.mean() >= 0.8, f"too many l0 flips: {matches}"


def test_shapes_kernel_empty_and_tiny():
    points = np.zeros((3, 64, 2), np.float32)
    valid = np.zeros((3, 64), bool)
    counts = np.zeros(3, np.int32)
    points[1, 0] = [0.5, 0.5]
    valid[1, 0] = True
    counts[1] = 1
    points[2, :6] = 0.3 + 0.01 * np.random.default_rng(0).standard_normal(
        (6, 2))
    valid[2, :6] = True
    counts[2] = 6
    out = cluster_shapes_pallas(jnp.asarray(points), jnp.asarray(valid),
                                jnp.asarray(counts), max_hull=16)
    r = np.asarray(out["radius"])
    assert r[0] == 0.0 and r[1] == 0.0 and r[2] > 0

"""Grid-hash DBSCAN vs sequential oracle and vs the dense engine."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import make_blobs
from vtkcloudpoint_tpu.cluster.grid import dbscan_grid
from vtkcloudpoint_tpu.cluster.dbscan import dbscan_padded
from vtkcloudpoint_tpu.oracle.dbscan_oracle import dbscan_oracle


@pytest.mark.parametrize("seed", range(5))
def test_grid_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    pts = make_blobs(rng, n_clusters=5, pts_per=35, noise=40, spread=0.012)
    eps, mp = 0.06, 9
    out = dbscan_grid(jnp.asarray(pts), jnp.ones(len(pts), bool), eps, mp,
                      cell_cap=64)
    assert int(out["overflow"]) == 0
    ref, k, _ = dbscan_oracle(pts, eps, mp)
    np.testing.assert_array_equal(np.asarray(out["label"]), ref)
    assert int(out["n_clusters"]) == k


def test_grid_matches_dense_large(rng):
    pts = make_blobs(rng, n_clusters=12, pts_per=80, noise=200, spread=0.01)
    eps, mp = 0.04, 6
    n = len(pts)
    g = dbscan_grid(jnp.asarray(pts), jnp.ones(n, bool), eps, mp, cell_cap=96)
    d = dbscan_padded(jnp.asarray(pts), jnp.ones(n, bool), eps, mp)
    assert int(g["overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(g["label"]),
                                  np.asarray(d["label"]))


def test_grid_cf_and_padding(rng):
    pts = make_blobs(rng, n_clusters=3, pts_per=30, noise=20, spread=0.01)
    n = len(pts)
    cap = n + 37
    coords = np.zeros((cap, 2))
    coords[:n] = pts
    valid = np.zeros(cap, bool)
    valid[:n] = True
    out = dbscan_grid(jnp.asarray(coords), jnp.asarray(valid), 0.06, 9, cf=5,
                      cell_cap=64)
    ref, k, _ = dbscan_oracle(pts, 0.06, 9, cf=5)
    np.testing.assert_array_equal(np.asarray(out["label"])[:n], ref)
    assert (np.asarray(out["label"])[n:] == 0).all()


def test_grid_overflow_reported(rng):
    # 100 coincident points with cap 8: cell overflows
    pts = np.zeros((100, 2))
    out = dbscan_grid(jnp.asarray(pts), jnp.ones(100, bool), 0.1, 5,
                      cell_cap=8)
    assert int(out["overflow"]) == 92


@pytest.mark.parametrize("seed", range(3))
def test_grid_3d_matches_dense(seed):
    """27-stencil 3D grid == dense engine under l2_xyz (VERDICT r2 item 4:
    the scale paths must serve 3D maps, not only motor coords)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 1, size=(6, 3))
    pts = np.concatenate(
        [c + 0.01 * rng.standard_normal((40, 3)) for c in centers]
        + [rng.uniform(0, 1, size=(60, 3))]
    ).astype(np.float32)
    n = len(pts)
    eps, mp = 0.05, 6
    g = dbscan_grid(jnp.asarray(pts), jnp.ones(n, bool), eps, mp,
                    metric="l2_xyz", cell_cap=96)
    d = dbscan_padded(jnp.asarray(pts), jnp.ones(n, bool), eps, mp,
                      metric="l2_xyz")
    assert int(g["overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(g["label"]),
                                  np.asarray(d["label"]))


def test_grid_3d_negative_coords(rng):
    """Global (origin-free) hashed cells: negative coordinates are fine."""
    pts = (rng.uniform(-3, -1, size=(150, 3))).astype(np.float32)
    pts[:60] = pts[0] + 0.004 * rng.standard_normal((60, 3))
    n = len(pts)
    g = dbscan_grid(jnp.asarray(pts), jnp.ones(n, bool), 0.03, 5,
                    metric="l2_xyz", cell_cap=96)
    d = dbscan_padded(jnp.asarray(pts), jnp.ones(n, bool), 0.03, 5,
                      metric="l2_xyz")
    assert int(g["overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(g["label"]),
                                  np.asarray(d["label"]))

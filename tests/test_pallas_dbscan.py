"""Fused Pallas DBSCAN kernel vs the dense jnp engine (interpret on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import make_blobs
from vtkcloudpoint_tpu.cluster.dbscan import dbscan_blocks
from vtkcloudpoint_tpu.ops.pallas.dbscan_kernel import dbscan_blocks_pallas


@pytest.mark.parametrize("seed", range(3))
def test_kernel_matches_dense(seed):
    rng = np.random.default_rng(seed)
    B, cap = 4, 128
    coords = np.zeros((B, cap, 2), np.float32)
    valid = np.zeros((B, cap), bool)
    for b in range(B):
        pts = make_blobs(rng, n_clusters=3, pts_per=25, noise=15,
                         spread=0.012).astype(np.float32)
        coords[b, :len(pts)] = pts
        valid[b, :len(pts)] = True
    out_k = dbscan_blocks_pallas(jnp.asarray(coords), jnp.asarray(valid),
                                 0.06, 9)
    out_d = dbscan_blocks(jnp.asarray(coords), jnp.asarray(valid), 0.06, 9)
    np.testing.assert_array_equal(np.asarray(out_k["label"]),
                                  np.asarray(out_d["label"]))
    np.testing.assert_array_equal(np.asarray(out_k["n_clusters"]),
                                  np.asarray(out_d["n_clusters"]))


def test_kernel_l2_metric(rng):
    B, cap = 2, 128
    coords = np.zeros((B, cap, 2), np.float32)
    valid = np.zeros((B, cap), bool)
    for b in range(B):
        pts = make_blobs(rng, n_clusters=2, pts_per=30, noise=10,
                         spread=0.01).astype(np.float32)
        coords[b, :len(pts)] = pts
        valid[b, :len(pts)] = True
    out_k = dbscan_blocks_pallas(jnp.asarray(coords), jnp.asarray(valid),
                                 0.05, 6, metric="l2_xy")
    # dense engine: l2 over the same 2D coords == metric l2_xyz w/ D=2
    out_d = dbscan_blocks(jnp.asarray(coords), jnp.asarray(valid), 0.05, 6,
                          metric="l2_xyz")
    np.testing.assert_array_equal(np.asarray(out_k["label"]),
                                  np.asarray(out_d["label"]))

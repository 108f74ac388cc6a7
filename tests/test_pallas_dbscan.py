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


@pytest.mark.parametrize("group", [2, 4])
def test_batched_kernel_matches_one_block(group):
    """Grouped kernel (G blocks/grid step) is bit-equal to one-block,
    including the pad-to-multiple-of-G path (B=5 with G=2/4 pads 1/3
    empty blocks)."""
    from vtkcloudpoint_tpu.ops.pallas.dbscan_kernel import (
        dbscan_blocks_pallas_batched)

    rng = np.random.default_rng(11)
    B, cap = 5, 128
    coords = np.zeros((B, cap, 2), np.float32)
    valid = np.zeros((B, cap), bool)
    for b in range(B):
        pts = make_blobs(rng, n_clusters=3, pts_per=25, noise=15,
                         spread=0.012).astype(np.float32)
        coords[b, :len(pts)] = pts
        valid[b, :len(pts)] = True
    out_1 = dbscan_blocks_pallas(jnp.asarray(coords), jnp.asarray(valid),
                                 0.06, 9)
    out_g = dbscan_blocks_pallas_batched(
        jnp.asarray(coords), jnp.asarray(valid), 0.06, 9, group=group)
    for k in ("label", "n_clusters", "core"):
        np.testing.assert_array_equal(np.asarray(out_g[k]),
                                      np.asarray(out_1[k]))


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


def test_kernel_core_matches_dense(rng):
    B, cap = 2, 128
    coords = np.zeros((B, cap, 2), np.float32)
    valid = np.zeros((B, cap), bool)
    for b in range(B):
        pts = make_blobs(rng, n_clusters=2, pts_per=25, noise=10,
                         spread=0.012).astype(np.float32)
        coords[b, :len(pts)] = pts
        valid[b, :len(pts)] = True
    out_k = dbscan_blocks_pallas(jnp.asarray(coords), jnp.asarray(valid),
                                 0.06, 6)
    out_d = dbscan_blocks(jnp.asarray(coords), jnp.asarray(valid), 0.06, 6)
    np.testing.assert_array_equal(np.asarray(out_k["core"]),
                                  np.asarray(out_d["core"]))


def test_backend_dispatch_pipeline(rng):
    """cluster_scan(backend=pallas) == cluster_scan(backend=jnp) bit-for-bit
    (VERDICT r1 item 1: the production path must drive the kernels)."""
    from vtkcloudpoint_tpu.cluster.pipeline import cluster_scan
    from vtkcloudpoint_tpu.config import EngineConfig, ClusterConfig

    pts = make_blobs(rng, n_clusters=4, pts_per=40, noise=30,
                     spread=0.012).astype(np.float32)
    n = len(pts)
    motor = jnp.asarray(pts)
    xyz = jnp.concatenate([motor, jnp.zeros((n, 1), jnp.float32)], 1)
    valid = jnp.ones(n, bool)
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.06, min_pts=6,
                                             block_capacity=128))
    kw = dict(max_blocks=8, max_clusters=64, cluster_capacity=128,
              noise_capacity=128, max_hull=16)
    a = cluster_scan(xyz, motor, valid, cfg, backend="pallas", **kw)
    b = cluster_scan(xyz, motor, valid, cfg, backend="jnp", **kw)
    np.testing.assert_array_equal(np.asarray(a.label), np.asarray(b.label))
    assert int(a.n_clusters) == int(b.n_clusters)


def test_backend_dispatch_icp(rng):
    from vtkcloudpoint_tpu.register.icp import icp
    from vtkcloudpoint_tpu.config import ICPConfig

    src = rng.uniform(-1, 1, (96, 3)).astype(np.float32)
    ang = 0.2
    r = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    tgt = src @ r.T + np.float32([0.1, -0.05, 0.02])
    valid = jnp.ones(96, bool)
    cfg = ICPConfig(max_iterations=30)
    a = icp(jnp.asarray(src), valid, jnp.asarray(tgt), valid, cfg,
            backend="pallas")
    b = icp(jnp.asarray(src), valid, jnp.asarray(tgt), valid, cfg,
            backend="jnp")
    np.testing.assert_allclose(np.asarray(a.r), np.asarray(b.r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-5)

"""Blocked pipeline vs sequential transcription oracle: the core
bit-compatibility acceptance (BASELINE.md tiers 1-2)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import make_blobs
from vtkcloudpoint_tpu.config import EngineConfig, ClusterConfig
from vtkcloudpoint_tpu.cluster.blocks import (
    assign_blocks_reference, assign_blocks_balanced, gather_blocks,
)
from vtkcloudpoint_tpu.cluster.pipeline import (
    cluster_scan, reject_clusters, single_block_dbscan,
)
from vtkcloudpoint_tpu.cluster.fusion import merge_centroid_clusters
from vtkcloudpoint_tpu.oracle.pipeline_oracle import (
    partition_reference_oracle, blocked_dbscan_oracle, centroid_merge_oracle,
)
from vtkcloudpoint_tpu.oracle.dbscan_oracle import dbscan_oracle


def scan_data(seed, n_clusters=6, pts_per=40, noise=60):
    rng = np.random.default_rng(seed)
    motor = make_blobs(rng, n_clusters=n_clusters, pts_per=pts_per, noise=noise,
                       spread=0.012)
    xyz = np.concatenate([motor, np.ones((len(motor), 1))], axis=1)
    return motor, xyz


@pytest.mark.parametrize("seed", range(5))
def test_partition_matches_oracle(seed):
    motor, _ = scan_data(seed)
    out = assign_blocks_reference(jnp.asarray(motor),
                                  jnp.ones(len(motor), bool), 60)
    oblock, on = partition_reference_oracle(motor, 60)
    np.testing.assert_array_equal(np.asarray(out["block"]), oblock)
    assert int(out["n_blocks"]) == on


@pytest.mark.parametrize("seed", range(5))
def test_blocked_pipeline_matches_oracle(seed):
    motor, xyz = scan_data(seed)
    n = len(motor)
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.06, min_pts=9,
                                             pts_in_cell=60,
                                             block_capacity=256))
    res = cluster_scan(jnp.asarray(xyz), jnp.asarray(motor),
                       jnp.ones(n, bool), cfg, max_blocks=64,
                       max_clusters=256, cluster_capacity=256)
    assert int(res.block_overflow) == 0
    assert int(res.noise_overflow) == 0
    olabels, ototal, _ = blocked_dbscan_oracle(motor, 0.06, 9, 60)
    np.testing.assert_array_equal(np.asarray(res.label), olabels)
    assert int(res.n_clusters) == ototal


def test_single_block_is_plain_dbscan():
    motor, xyz = scan_data(42)
    n = len(motor)
    cfg = EngineConfig()
    out = single_block_dbscan(jnp.asarray(xyz), jnp.asarray(motor),
                              jnp.ones(n, bool), cfg)
    ref, k, _ = dbscan_oracle(motor, cfg.cluster.eps, cfg.cluster.min_pts)
    np.testing.assert_array_equal(np.asarray(out["label"]), ref)


@pytest.mark.parametrize("seed", range(3))
def test_centroid_merge_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 12
    centers = rng.uniform(0, 1, size=(k, 2))
    centers[3] = centers[7] + 0.01   # force merges
    centers[5] = centers[1] + 0.015
    cxy = np.zeros((k + 1, 2))
    cxy[1:] = centers
    cvalid = np.ones(k + 1, bool)
    cvalid[0] = False
    out = merge_centroid_clusters(jnp.asarray(cxy), jnp.asarray(cvalid),
                                  merge_eps=0.05, merge_min_pts=2)
    oremap = centroid_merge_oracle(centers, 0.05, 2)
    np.testing.assert_array_equal(np.asarray(out["remap"]), oremap)
    assert int(out["n_after"]) == oremap.max()


def test_centroid_merge_in_pipeline_runs():
    motor, xyz = scan_data(7)
    n = len(motor)
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.06, min_pts=9,
                                             pts_in_cell=60,
                                             merge_threshold=0.2))
    res = cluster_scan(jnp.asarray(xyz), jnp.asarray(motor),
                       jnp.ones(n, bool), cfg, max_blocks=64,
                       max_clusters=256, cluster_capacity=256,
                       centroid_merge=True)
    lab = np.asarray(res.label)
    k = int(res.n_clusters)
    # dense ids 1..k
    assert set(np.unique(lab)) <= set(range(k + 1))
    nz = np.unique(lab[lab > 0])
    np.testing.assert_array_equal(nz, np.arange(1, len(nz) + 1))


def test_reject_clusters():
    motor, xyz = scan_data(3)
    n = len(motor)
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.06, min_pts=9,
                                             pts_in_cell=60))
    res = cluster_scan(jnp.asarray(xyz), jnp.asarray(motor),
                       jnp.ones(n, bool), cfg, max_blocks=64,
                       max_clusters=256, cluster_capacity=256)
    radii = np.asarray(res.radius3d)
    live = np.asarray(res.count) > 0
    assert live[1:].any()
    thr = np.median(radii[live & (radii > 0)])
    new_valid, rejected = reject_clusters(res, jnp.ones(n, bool), thr)
    rejected = np.asarray(rejected)
    new_valid = np.asarray(new_valid)
    lab = np.asarray(res.label)
    for c in np.nonzero(rejected)[0]:
        assert not new_valid[lab == c].any()
    for c in np.nonzero(live & ~rejected)[0]:
        if c > 0:
            assert new_valid[lab == c].all()


def test_balanced_blocks_full_and_ordered():
    motor, _ = scan_data(9)
    n = len(motor)
    out = assign_blocks_balanced(jnp.asarray(motor), jnp.ones(n, bool), 64)
    block = np.asarray(out["block"])
    nb = int(out["n_blocks"])
    assert nb == int(np.ceil(n / 64))
    counts = np.bincount(block, minlength=nb)
    assert (counts[:-1] == 64).all() and counts[-1] == n - 64 * (nb - 1)


def test_balanced_pipeline_runs_and_is_sane():
    motor, xyz = scan_data(21)
    n = len(motor)
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.06, min_pts=9,
                                             block_capacity=128))
    res = cluster_scan(jnp.asarray(xyz), jnp.asarray(motor),
                       jnp.ones(n, bool), cfg, mode="balanced",
                       max_blocks=16, max_clusters=256, cluster_capacity=256,
                       quirks=False)
    assert int(res.block_overflow) == 0
    lab = np.asarray(res.label)
    # sanity: major blobs recovered (>= n_clusters real blobs present)
    assert int(res.n_clusters) >= 4
    assert (lab >= 0).all()


def test_halo_merge_in_pipeline():
    """halo_merge=True recovers the true cluster count on a split scene."""
    rng = np.random.default_rng(77)
    stripe = np.stack([np.linspace(0, 2.0, 120), np.zeros(120)], axis=1)
    stripe = np.repeat(stripe, 3, axis=0) + 0.005 * rng.standard_normal((360, 2))
    blob = np.array([5.0, 5.0]) + 0.01 * rng.standard_normal((40, 2))
    motor = np.concatenate([stripe, blob])
    rng.shuffle(motor)
    xyz = np.concatenate([motor, np.ones((len(motor), 1))], axis=1)
    n = len(motor)
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.08, min_pts=6,
                                             block_capacity=128))
    plain = cluster_scan(jnp.asarray(xyz), jnp.asarray(motor),
                         jnp.ones(n, bool), cfg, mode="balanced",
                         max_blocks=4, max_clusters=64, cluster_capacity=512,
                         quirks=False)
    merged = cluster_scan(jnp.asarray(xyz), jnp.asarray(motor),
                          jnp.ones(n, bool), cfg, mode="balanced",
                          max_blocks=4, max_clusters=64, cluster_capacity=512,
                          quirks=False, halo_merge=True, halo_cap=128)
    k_true = dbscan_oracle(motor, 0.08, 6)[1]
    assert k_true == 2
    assert int(plain.n_clusters) > k_true
    assert int(merged.n_clusters) == k_true


def test_partition_gather_sorted_matches_two_step():
    """The fused one-sort partition equals assign_blocks_balanced +
    gather_blocks_ordered (the gather-free bench path)."""
    import numpy as np
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.cluster.blocks import (
        assign_blocks_balanced, gather_blocks_ordered,
        partition_gather_sorted)

    rng = np.random.default_rng(21)
    for n, cap in ((2000, 64), (5000, 128)):
        motor = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        valid = jnp.asarray(rng.random(n) < 0.9)
        b = (n + cap - 1) // cap
        part = assign_blocks_balanced(jnp.asarray(motor), valid, cap)
        bc0, bv0, pi0, ov0 = gather_blocks_ordered(
            jnp.asarray(motor), part["order"], valid, b, cap)
        bc1, bv1, pi1, ov1 = partition_gather_sorted(
            jnp.asarray(motor), valid, cap, b)
        np.testing.assert_array_equal(np.asarray(pi0), np.asarray(pi1))
        np.testing.assert_array_equal(np.asarray(bv0), np.asarray(bv1))
        np.testing.assert_allclose(np.asarray(bc0), np.asarray(bc1))
        np.testing.assert_array_equal(np.asarray(ov0), np.asarray(ov1))

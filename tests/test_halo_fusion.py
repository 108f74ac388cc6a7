"""Halo union-find merges clusters split across block boundaries -- the
beyond-reference correctness fix (the reference keeps two ids for a split
cluster unless its pieces end up as noise)."""
import numpy as np
import jax.numpy as jnp

from vtkcloudpoint_tpu.cluster.blocks import assign_blocks_balanced, gather_blocks_ordered
from vtkcloudpoint_tpu.cluster.dbscan import dbscan_blocks, dbscan_padded
from vtkcloudpoint_tpu.cluster.fusion import merge_blocks
from vtkcloudpoint_tpu.cluster.halo_fusion import halo_merge_labels, apply_halo_merge
from vtkcloudpoint_tpu.oracle.dbscan_oracle import dbscan_oracle


def split_cluster_scene(rng):
    """A dense stripe spanning x in [0, 2] (one true cluster) plus two far
    blobs; block capacity chosen so the stripe splits across blocks."""
    stripe = np.stack([np.linspace(0, 2.0, 120),
                       np.zeros(120)], axis=1)
    stripe = np.repeat(stripe, 3, axis=0) + 0.005 * rng.standard_normal((360, 2))
    blob1 = np.array([5.0, 5.0]) + 0.01 * rng.standard_normal((40, 2))
    blob2 = np.array([-5.0, 5.0]) + 0.01 * rng.standard_normal((40, 2))
    pts = np.concatenate([stripe, blob1, blob2])
    rng.shuffle(pts)
    return pts


def run_blocked(pts, eps, mp, cap):
    n = len(pts)
    valid = jnp.ones(n, bool)
    part = assign_blocks_balanced(jnp.asarray(pts), valid, cap)
    B = int(np.ceil(n / cap))
    bc, bv, pidx, _ = gather_blocks_ordered(jnp.asarray(pts), part["order"],
                                            valid, B, cap)
    db = dbscan_blocks(bc, bv, eps, mp, "l1_motor")
    fused = merge_blocks(db["label"], bv, bc, pidx, n, eps, mp, "l1_motor",
                         quirks=False, noise_capacity=1024)
    return db, fused, bc, bv, pidx


def test_halo_merge_unifies_split_cluster(rng):
    pts = split_cluster_scene(rng)
    eps, mp, cap = 0.08, 6, 128
    db, fused, bc, bv, pidx = run_blocked(pts, eps, mp, cap)
    n_before = int(fused["n_total"])
    # ground truth cluster count from the global oracle
    _, k_true, _ = dbscan_oracle(pts, eps, mp)
    assert k_true == 3
    assert n_before > 3, "scene must actually split across blocks"

    # rebuild per-block global labels for the halo pass
    B, cap_ = bc.shape[:2]
    flat_label = np.asarray(fused["label"])
    pidx_np = np.asarray(pidx)
    block_glabels = np.zeros((B, cap_), np.int32)
    m = pidx_np >= 0
    block_glabels[m] = flat_label[pidx_np[m]]

    out = halo_merge_labels(bc, bv, jnp.asarray(block_glabels), db["core"],
                            fused["n_total"], eps, halo_cap=128, max_ids=256)
    assert int(out["halo_overflow"]) == 0
    merged = np.asarray(apply_halo_merge(jnp.asarray(flat_label),
                                         out["remap"]))
    n_after = int(out["n_after"])
    assert n_after == k_true, (n_before, n_after, k_true)
    # merged labels dense 1..n_after
    nz = np.unique(merged[merged > 0])
    np.testing.assert_array_equal(nz, np.arange(1, n_after + 1))
    # every true-cluster's points share one merged id (compare partitions on
    # core points, which are unambiguous)
    ref, _, _ = dbscan_oracle(pts, eps, mp)
    for c in range(1, k_true + 1):
        ids = np.unique(merged[(ref == c)])
        ids = ids[ids > 0]
        assert len(ids) == 1


def test_halo_merge_noop_when_no_split(rng):
    """Four far-separated 32-point blobs with block capacity 32: Morton
    chunking puts each blob in its own block, so nothing should merge."""
    corners = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    pts = np.concatenate([
        np.array(c) + 0.01 * rng.standard_normal((32, 2)) for c in corners
    ])
    rng.shuffle(pts)
    eps, mp, cap = 0.08, 6, 32
    db, fused, bc, bv, pidx = run_blocked(pts, eps, mp, cap)
    B, cap_ = bc.shape[:2]
    flat_label = np.asarray(fused["label"])
    pidx_np = np.asarray(pidx)
    block_glabels = np.zeros((B, cap_), np.int32)
    m = pidx_np >= 0
    block_glabels[m] = flat_label[pidx_np[m]]
    out = halo_merge_labels(bc, bv, jnp.asarray(block_glabels), db["core"],
                            fused["n_total"], eps, halo_cap=64, max_ids=64)
    assert int(out["n_after"]) == int(fused["n_total"])


def test_grid_union_ids_matches_pairwise(rng):
    """grid-hash adjacency union == O(H^2) pairwise union on random halo
    sets (ids, components, remap and survivor count all bit-equal)."""
    from vtkcloudpoint_tpu.cluster.halo_fusion import union_ids, grid_union_ids

    for seed in range(4):
        r = np.random.default_rng(seed)
        # chains of touching mini-clusters + isolated singles, random ids
        n = 160
        hx = np.zeros((n, 2), np.float32)
        k = 0
        x = 0.0
        while k < n - 8:
            run = int(r.integers(2, 7))
            for j in range(run):
                hx[k] = [x, 0.0]
                x += 0.05  # == eps: chain links
                k += 1
            x += 0.2       # gap: chain breaks
        hx[k:] = r.uniform(5, 6, size=(n - k, 2)).astype(np.float32)
        hlab = r.integers(1, 40, size=n).astype(np.int32)
        hval = r.random(n) < 0.9
        args = (jnp.asarray(hx), jnp.asarray(hlab), jnp.asarray(hval),
                jnp.int32(40), 0.05, "l1_motor", 64)
        a = union_ids(*args)
        b = grid_union_ids(*args, cell_cap=32)
        assert int(b["overflow"]) == 0
        np.testing.assert_array_equal(np.asarray(a["remap"]),
                                      np.asarray(b["remap"]))
        assert int(a["n_after"]) == int(b["n_after"])

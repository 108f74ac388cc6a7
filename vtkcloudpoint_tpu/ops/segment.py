"""Per-cluster segment reductions: counts, centroids (3D + motor 2D), weighted
centroids with duplicate multiplicity.

TPU-native replacement for the reference's per-cluster list scans
(Tools.getClusterCenter / GetClusList, Tools.cs:118-195; weighted fixed-point
centroid getFixedPtsCentroid, Tools.cs:78-111): one segment_sum over the whole
point set instead of per-cluster Average() passes.

Cluster id convention matches the reference: label 0 = noise; clusters are
1..K. Segment tables are laid out with row c = cluster id c (row 0 collects
noise and is ignored by callers).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def cluster_counts(label, valid, num_segments: int):
    """Point count per cluster id. [num_segments] with row 0 = noise."""
    w = valid.astype(jnp.int32)
    return jax.ops.segment_sum(w, label, num_segments=num_segments)


def cluster_means(values, label, valid, num_segments: int, weights=None):
    """Per-cluster mean of ``values`` [N, D] -> [num_segments, D].

    weights: optional i32/f32 [N] multiplicity (reference ptsCount,
    Tools.cs:92-101). Empty clusters return 0.
    """
    w = valid.astype(values.dtype)
    if weights is not None:
        w = w * weights.astype(values.dtype)
    sums = jax.ops.segment_sum(values * w[:, None], label, num_segments=num_segments)
    cnt = jax.ops.segment_sum(w, label, num_segments=num_segments)
    return sums / jnp.maximum(cnt, 1)[:, None], cnt


@partial(jax.jit, static_argnames=("num_segments",))
def cluster_stats(xyz, motor, label, valid, num_segments: int, mult=None):
    """All reference centroid tables in one pass.

    Returns dict:
      count    i32[K+1]  points per cluster (row 0 = noise)
      center3d f[K+1,3]  mean xyz        (Tools.cs:189 centers)
      center2d f[K+1,2]  mean motor      (Tools.cs:190 centers2D)
    """
    center3d, _ = cluster_means(xyz, label, valid, num_segments, mult)
    center2d, cnt = cluster_means(motor, label, valid, num_segments, mult)
    return {
        "count": cluster_counts(label, valid, num_segments),
        "weighted_count": cnt,
        "center3d": center3d,
        "center2d": center2d,
    }


def bucket_by_cluster(label, valid, num_segments: int, capacity: int):
    """Build a per-cluster point-index table [num_segments, capacity].

    Used to hand per-cluster padded point sets to the geometry kernels
    (hull/MEC/min-rect). Entries are point indices; -1 = empty slot. Points
    beyond ``capacity`` per cluster are dropped and counted in ``overflow``
    (fixed-capacity discipline, SURVEY.md §7 hard part (e)).

    Slot order within each cluster is ascending point index (stable), which
    matches the reference's list order after its per-cell processing.
    """
    n = label.shape[0]
    lab = jnp.where(valid, label, num_segments)  # invalid -> out of range
    # stable sort by label; ranks within each label run
    order = jnp.argsort(lab, stable=True)
    sorted_lab = lab[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    # start position of each label's run
    first_of_lab = jnp.searchsorted(sorted_lab, jnp.arange(num_segments + 1), side="left")
    rank = idx - first_of_lab[jnp.clip(sorted_lab, 0, num_segments)]
    in_cap = (rank < capacity) & (sorted_lab < num_segments)
    table = jnp.full((num_segments, capacity), -1, dtype=jnp.int32)
    flat = jnp.where(
        in_cap,
        jnp.clip(sorted_lab, 0, num_segments - 1) * capacity + jnp.clip(rank, 0, capacity - 1),
        num_segments * capacity,  # dropped
    )
    table = (
        table.reshape(-1)
        .at[flat]
        .set(order.astype(jnp.int32), mode="drop")
        .reshape(num_segments, capacity)
    )
    counts = cluster_counts(label, valid, num_segments)
    overflow = jnp.maximum(counts - capacity, 0)
    return table, overflow

"""Segment reductions vs direct NumPy group-bys."""
import numpy as np
import jax.numpy as jnp

from vtkcloudpoint_tpu.ops.segment import (
    cluster_counts, cluster_stats, bucket_by_cluster,
)


def test_cluster_stats_matches_groupby(rng):
    n, K = 500, 6
    label = rng.integers(0, K + 1, size=n).astype(np.int32)
    valid = rng.random(n) < 0.9
    xyz = rng.standard_normal((n, 3))
    motor = rng.standard_normal((n, 2))
    mult = rng.integers(1, 5, size=n).astype(np.int32)

    out = cluster_stats(jnp.asarray(xyz), jnp.asarray(motor),
                        jnp.asarray(label), jnp.asarray(valid), K + 1,
                        mult=jnp.asarray(mult))
    for c in range(K + 1):
        m = valid & (label == c)
        assert int(out["count"][c]) == m.sum()
        if m.sum():
            w = mult[m].astype(float)
            np.testing.assert_allclose(
                np.asarray(out["center3d"])[c],
                (xyz[m] * w[:, None]).sum(0) / w.sum(), rtol=1e-12)
            np.testing.assert_allclose(
                np.asarray(out["center2d"])[c],
                (motor[m] * w[:, None]).sum(0) / w.sum(), rtol=1e-12)


def test_unweighted_means(rng):
    n, K = 300, 4
    label = rng.integers(0, K + 1, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    xyz = rng.standard_normal((n, 3))
    motor = rng.standard_normal((n, 2))
    out = cluster_stats(jnp.asarray(xyz), jnp.asarray(motor),
                        jnp.asarray(label), jnp.asarray(valid), K + 1)
    for c in range(1, K + 1):
        m = label == c
        np.testing.assert_allclose(np.asarray(out["center3d"])[c],
                                   xyz[m].mean(0), rtol=1e-12)


def test_bucket_by_cluster(rng):
    n, K, cap = 200, 5, 64
    label = rng.integers(0, K + 1, size=n).astype(np.int32)
    valid = rng.random(n) < 0.95
    table, overflow = bucket_by_cluster(jnp.asarray(label), jnp.asarray(valid),
                                        K + 1, cap)
    table = np.asarray(table)
    assert (np.asarray(overflow) == 0).all()
    for c in range(K + 1):
        want = np.nonzero(valid & (label == c))[0]
        got = table[c][table[c] >= 0]
        np.testing.assert_array_equal(np.sort(got), want)
        # stable ascending order within cluster
        np.testing.assert_array_equal(got, want)


def test_bucket_overflow(rng):
    n, cap = 100, 8
    label = np.ones(n, np.int32)  # all in cluster 1
    valid = np.ones(n, bool)
    table, overflow = bucket_by_cluster(jnp.asarray(label), jnp.asarray(valid),
                                        3, cap)
    assert int(overflow[1]) == n - cap
    got = np.asarray(table)[1]
    np.testing.assert_array_equal(got, np.arange(cap))

"""Pallas neighbor kernels vs jnp fallbacks (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.ops.pallas.neighbor import (
    radius_count_pallas, radius_count_jnp, nn_pallas,
)
from vtkcloudpoint_tpu.register.icp import nn_correspond


@pytest.mark.parametrize("metric", ["l1_motor", "l2_xyz"])
def test_radius_count(metric, rng):
    n = 300
    d = 2 if metric == "l1_motor" else 3
    pts = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    valid = rng.random(n) < 0.9
    eps = 0.1
    got = np.asarray(radius_count_pallas(jnp.asarray(pts), jnp.asarray(valid),
                                         eps, metric, tile_q=128, tile_r=128))
    want = np.asarray(radius_count_jnp(jnp.asarray(pts), jnp.asarray(valid),
                                       eps, metric))
    want = np.where(valid, want, 0)
    got = np.where(valid, got, 0)
    np.testing.assert_array_equal(got, want)


def test_nn_matches_jnp(rng):
    q = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    r = rng.uniform(0, 1, size=(350, 3)).astype(np.float32)
    rv = rng.random(350) < 0.9
    idx_p, d2_p = nn_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(rv),
                            tile_q=128, tile_r=128)
    idx_j, d2_j = nn_correspond(jnp.asarray(q), jnp.asarray(r), jnp.asarray(rv))
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_j),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))

"""Failure-detection primitives (retry / heartbeat)."""
import time

import pytest

from vtkcloudpoint_tpu.utils.resilience import (
    retry, Heartbeat, check_heartbeat,
)


def test_retry_recovers():
    calls = []

    @retry(attempts=3, backoff=0.01)
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise OSError("transient")
        return "ok"

    assert flaky() == "ok"
    assert len(calls) == 3


def test_retry_exhausts():
    @retry(attempts=2, backoff=0.01, exceptions=(ValueError,))
    def bad():
        raise ValueError("always")

    with pytest.raises(ValueError):
        bad()


def test_heartbeat(tmp_path):
    p = str(tmp_path / "hb")
    alive, age = check_heartbeat(p, 10.0)
    assert not alive and age is None
    hb = Heartbeat(p)
    assert hb.beat("step 1") == 1
    alive, age = check_heartbeat(p, 10.0)
    assert alive and age < 5.0
    assert not check_heartbeat(p, -1.0)[0]   # already stale at timeout<0


def test_slam_pipeline_writes_heartbeat(tmp_path, rng):
    import numpy as np
    import jax.numpy as jnp
    from tests.test_slam import make_scans
    from vtkcloudpoint_tpu.config import ICPConfig
    from vtkcloudpoint_tpu.slam.trajectory import slam_pipeline_checkpointed

    scans, _, _ = make_scans(5, 80, rng)
    valid = np.ones((5, 80), bool)
    out = slam_pipeline_checkpointed(
        jnp.asarray(scans), jnp.asarray(valid), str(tmp_path),
        icp_cfg=ICPConfig(tol=1e-12), every=2, loop_radius=10.0,
        gn_iterations=3)
    assert out is not None
    alive, age = check_heartbeat(str(tmp_path / "heartbeat"), 60.0)
    assert alive

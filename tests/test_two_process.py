"""Two-process jax.distributed smoke (VERDICT r1 item 10): the distributed
DBSCAN (ring halo, grid noise re-cluster) over 2 processes x 4 virtual CPU
devices equals the single-process 8-device run."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.two_process_common import make_case
from vtkcloudpoint_tpu.parallel.mesh import make_mesh
from vtkcloudpoint_tpu.parallel.sharded import sharded_blocked_dbscan

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_expected(mode):
    bc, bv = make_case()
    mesh = make_mesh(8)
    kw = dict(eps=0.08, min_pts=6, quirks=False,
              noise_capacity_per_device=128, halo_merge=True, halo_cap=64,
              max_ids=256)
    if mode == "hier_dist":
        kw.update(halo_mode="hier", dev_halo_cap=256, halo_cell_cap=128,
                  noise_recluster="distributed", noise_skin_cap=128,
                  noise_root_cap=128, noise_cell_cap=128,
                  split_programs=True)
    else:
        kw.update(halo_mode="ring")
    out = sharded_blocked_dbscan(mesh, jnp.asarray(bc), jnp.asarray(bv),
                                 **kw)
    lab = np.asarray(out["label"], np.float64)
    pos = np.arange(lab.size, dtype=np.float64).reshape(lab.shape)
    return {
        "n_total": int(out["n_total"]),
        "noise_overflow": int(out["noise_overflow"]),
        "halo_overflow": int(out["halo_overflow"]),
        "sum_labels": float(lab.sum()),
        "sum_weighted": float((lab * (pos + 1.0)).sum()),
    }


def test_two_process_kill_resume_checkpoint(tmp_path):
    """Kill-resume at the tier-5 scale configuration (VERDICT r4 item 8):
    phase 1 workers die the instant the split-boundary checkpoint is
    saved (exit 77); phase 2 relaunches with the same checkpoint dir,
    asserts the checkpoint is used, and must produce results identical to
    the uncheckpointed single-process run."""
    expected = _single_process_expected("hier_dist")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(_REPO, "tests", "two_process_worker.py")

    def launch(phase):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(port), str(tmp_path),
                 "hier_dist_ckpt", phase],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                cwd=_REPO,
            )
            for i in range(2)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail(f"kill-resume phase {phase} timed out")
            logs.append(out.decode(errors="replace"))
        return procs, logs

    procs, logs = launch("kill")
    for i, p in enumerate(procs):
        if p.returncode != 77 and "distributed" in logs[i].lower() and (
                "unimplemented" in logs[i].lower()
                or "not available" in logs[i].lower()):
            pytest.skip(f"jax.distributed unsupported: {logs[i][-300:]}")
        # each worker waits for the PEER's checkpoint before dying, so by
        # the time anyone exits both checkpoints are durable -- but the
        # peer's exit can still trip this worker's background coordination
        # FATAL handler (rc 1) a hair before its own os._exit(77). Either
        # way is the crash being simulated; the real gate is the
        # checkpoint-exists assert below + the resume equality.
        assert p.returncode in (77, 1), (
            f"kill phase worker {i} rc={p.returncode}\n{logs[i][-3000:]}")
    for i in range(2):
        assert os.path.exists(
            tmp_path / "ckpt" / f"p{i}" / "ckpt_0.npz"), \
            "checkpoint missing after kill phase"

    procs, logs = launch("resume")
    for i, p in enumerate(procs):
        assert p.returncode == 0, (
            f"resume phase worker {i} rc={p.returncode}\n{logs[i][-3000:]}")
    results = []
    for i in range(2):
        with open(tmp_path / f"out_hier_dist_ckpt_{i}.json") as f:
            results.append(json.load(f))
    assert results[0] == results[1]
    assert results[0] == expected


@pytest.mark.parametrize("mode", ["ring", "hier_dist"])
def test_two_process_matches_single(tmp_path, mode):
    # pytest-timeout is not installed; the communicate(timeout=420) below is
    # the real guard against a hung worker pair. The hier_dist mode drives
    # the tier-5 scale configuration (hierarchical halo union, owner-
    # sharded noise re-cluster, split programs) across REAL processes.
    expected = _single_process_expected(mode)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(_REPO, "tests", "two_process_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path),
             mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=_REPO,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process smoke timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        if p.returncode != 0:
            if "distributed" in logs[i].lower() and (
                "unimplemented" in logs[i].lower()
                or "not available" in logs[i].lower()
            ):
                pytest.skip(f"jax.distributed unsupported here: "
                            f"{logs[i][-300:]}")
            pytest.fail(f"worker {i} rc={p.returncode}\n{logs[i][-3000:]}")
    results = []
    for i in range(2):
        with open(tmp_path / f"out_{mode}_{i}.json") as f:
            results.append(json.load(f))
    assert results[0] == results[1]
    assert results[0] == expected

"""Worker for the two-process jax.distributed smoke test (VERDICT r1
item 10). Launched twice by tests/test_two_process.py; each process owns 4
virtual CPU devices (8 global), feeds its half of the blocks through
jax.make_array_from_process_local_data, and runs the full distributed DBSCAN
(ring halo merge -> cross-process ppermute). Replicated outputs + label
checksums are written to a JSON file for the parent to compare against the
single-process run.

Usage: python two_process_worker.py <process_id> <coordinator_port> <outdir>
       [mode]    -- "ring" (default) or "hier_dist" (hierarchical halo union
                    + owner-sharded distributed noise re-cluster + split
                    programs: the tier-5 scale configuration)
       [phase]   -- with mode "hier_dist_ckpt": "kill" runs program 1, saves
                    the split-boundary checkpoint, then dies (os._exit 77 --
                    simulating a crash at the persistence point); "resume"
                    asserts the checkpoint exists and completes the job
                    from it (VERDICT r4 item 8 kill-resume criterion)
"""
import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "ring"
    phase = sys.argv[5] if len(sys.argv) > 5 else None
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=proc_id,
    )
    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vtkcloudpoint_tpu.parallel.distributed import (
        global_mesh, make_global_blocks,
    )
    from vtkcloudpoint_tpu.parallel.sharded import sharded_blocked_dbscan
    from tests.two_process_common import make_case

    bc, bv = make_case()                    # [8*Bd, cap, 2], [8*Bd, cap]
    mesh = global_mesh()
    ndev = 8
    bloc = bc.shape[0] // 2                 # per-process block rows
    sl = slice(proc_id * bloc, (proc_id + 1) * bloc)
    gbc = make_global_blocks(bc[sl], mesh)
    gbv = make_global_blocks(bv[sl], mesh)

    kw = dict(eps=0.08, min_pts=6, quirks=False,
              noise_capacity_per_device=128, halo_merge=True, halo_cap=64,
              max_ids=256)
    if mode.startswith("hier_dist"):
        kw.update(halo_mode="hier", dev_halo_cap=256, halo_cell_cap=128,
                  noise_recluster="distributed", noise_skin_cap=128,
                  noise_root_cap=128, noise_cell_cap=128,
                  split_programs=True)
    else:
        kw.update(halo_mode="ring")
    if mode == "hier_dist_ckpt":
        ckpt_dir = os.path.join(outdir, "ckpt")
        kw.update(checkpoint_dir=ckpt_dir)
        import vtkcloudpoint_tpu.utils.checkpoint as ck

        if phase == "kill":
            # die the instant the split-boundary checkpoint is durable --
            # the exact crash the checkpoint exists to survive. Wait for
            # the PEER's checkpoint first: the leader exiting early tears
            # down the coordination service and the still-computing peer
            # gets terminated (rc 1) before its own save lands (program 1
            # is collective-free, so this wait involves no collective).
            import time as _time

            orig_save = ck.CheckpointManager.save
            peer_idx = os.path.join(
                ckpt_dir, f"p{1 - proc_id}", "index.json")

            def save_and_die(self, step, tree):
                orig_save(self, step, tree)
                for _ in range(600):
                    if os.path.exists(peer_idx):
                        break
                    _time.sleep(0.5)
                os._exit(77)

            ck.CheckpointManager.save = save_and_die
        elif phase == "resume":
            mgr = ck.CheckpointManager(
                os.path.join(ckpt_dir, f"p{proc_id}"), keep=1)
            assert mgr.latest_step() is not None, \
                "resume phase found no checkpoint"
    out = sharded_blocked_dbscan(mesh, gbc, gbv, **kw)

    # replicated scalars + order-independent label checksums via global sums
    @jax.jit
    def sums(lab):
        pos = jnp.arange(lab.shape[0] * lab.shape[1],
                         dtype=jnp.float64).reshape(lab.shape)
        l = lab.astype(jnp.float64)
        return jnp.sum(l), jnp.sum(l * (pos + 1.0))

    s0, s1 = sums(out["label"])
    result = {
        "n_total": int(out["n_total"]),
        "noise_overflow": int(out["noise_overflow"]),
        "halo_overflow": int(out["halo_overflow"]),
        "sum_labels": float(s0),
        "sum_weighted": float(s1),
    }
    with open(os.path.join(outdir, f"out_{mode}_{proc_id}.json"), "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

"""Probe (round 5): DBSCAN kernel grid-step batching on the real chip.

The production kernel (`ops/pallas/dbscan_kernel.py`) runs ONE block per
grid step: at the bench shape that is 977 sequential steps of ~8 us
each.  Hypothesis: a fixed per-grid-step cost (prologue, SMEM scalar
stores, while_loop trip management) is a large fraction of the measured
7.8 ms, and batching G blocks per step -- [G, cap, cap] batched
adjacency + one shared min-label fixpoint that runs until ALL G blocks
converge -- amortizes it.  Trade-off: the shared fixpoint runs
max(sweeps over G blocks) sweeps for every block in the group, so a
group with one slow block pays extra VPU passes; VMEM bounds G
(adjacency + additive mask + sweep temp = ~3 * G MB at cap=512).

Run:  python benchmarks/probe_dbscan_r05.py          (real chip)

Measured (real v5e, 500k points):
- cap=512, 977 blocks: one-block 6.3 ms; G=8 5.2 ms (G=2 5.6, G=4 5.4,
  G=16 5.6, G=32 5.4) -- all bit_equal. ~1.3 us fixed cost per grid
  step; G=8 adopted in dbscan_blocks_dispatch for cap <= 512.
- cap=1024, 489 blocks: one-block 9.3 ms; G=2 FAILS to compile
  (tpu_compile_helper exit 1 -- a member's ~3 [cap, cap] f32 arrays are
  ~12 MB, two members exceed Mosaic's 16 MB VMEM scope; buffers are not
  fully reused across the unrolled members). With 4x the work per step
  the fixed cost is already amortized at this cap, so the one-block
  kernel stays.
- Pipeline-level: BENCH_BLOCK_CAP=512 halves per-block pair tests
  (dbscan stage 7.8 -> 4.9 ms) but produces 1,476 split-piece ids vs
  988, forcing MAX_CLUSTERS=2048 -- the doubled stats/bucket/shapes
  tables cost more than DBSCAN saves (full job 25.2 ms vs 23.9 at
  cap=1024, measured with overflow-clean tables both ways). cap=1024
  stays the bench default; the grouped kernel serves cap<=512 users
  (e.g. the sharded per-device path).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 500_000
CAP = 512
EPS = 0.004
MIN_PTS = 8


def bench_cloud(n, seed=3):
    # same generator family as bench.py's tier-2 cloud
    rng = np.random.default_rng(seed)
    k = n // 800
    n_noise = int(n * 0.004)
    nc = n - n_noise
    centers = rng.uniform(0.01, 0.99, size=(k, 2))
    per = nc // k
    pts = centers[:, None, :] + 0.0008 * rng.standard_normal((k, per, 2))
    parts = [pts.reshape(-1, 2),
             rng.uniform(0, 1, size=(nc - per * k, 2)),
             rng.uniform(0, 1, size=(n_noise, 2))]
    return np.concatenate(parts)[:n].astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-dev")
    except Exception:
        pass
    from vtkcloudpoint_tpu.cluster.blocks import partition_gather_sorted
    from vtkcloudpoint_tpu.ops.pallas.dbscan_kernel import (
        dbscan_blocks_pallas)

    motor = jnp.asarray(bench_cloud(N))
    valid = jnp.ones(N, bool)
    max_blocks = (N + CAP - 1) // CAP
    bc, bv, pidx, _ = jax.jit(
        lambda m, v: partition_gather_sorted(m, v, CAP, max_blocks)
    )(motor, valid)
    bc = jax.device_put(np.asarray(bc))
    bv = jax.device_put(np.asarray(bv))

    def timeit(f, *a, reps=3, k=8):
        def run_n(nrun):
            t0 = time.perf_counter()
            out = None
            for _ in range(nrun):
                out = f(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[:8])
            return time.perf_counter() - t0
        run_n(1)
        t1 = min(run_n(1) for _ in range(reps))
        tk = run_n(k)
        return max(tk - t1, 0.0) / (k - 1) * 1e3

    base = jax.jit(lambda c, v: dbscan_blocks_pallas(c, v, EPS, MIN_PTS,
                                                     "l1_motor"))
    out0 = base(bc, bv)
    ms0 = timeit(base, bc, bv)
    print(f"one-block-per-step: {ms0:.2f} ms "
          f"({max_blocks} grid steps)", flush=True)

    from vtkcloudpoint_tpu.ops.pallas.dbscan_kernel import (
        dbscan_blocks_pallas_batched)
    for G in (8, 16, 32):
        f = jax.jit(lambda c, v, G=G: dbscan_blocks_pallas_batched(
            c, v, EPS, MIN_PTS, "l1_motor", group=G))
        out = f(bc, bv)
        eq = (bool(jnp.array_equal(out["label"], out0["label"]))
              and bool(jnp.array_equal(out["n_clusters"],
                                       out0["n_clusters"]))
              and bool(jnp.array_equal(out["core"], out0["core"])))
        ms = timeit(f, bc, bv)
        print(f"G={G} blocks-per-step: {ms:.2f} ms  bit_equal={eq}",
              flush=True)


if __name__ == "__main__":
    main()

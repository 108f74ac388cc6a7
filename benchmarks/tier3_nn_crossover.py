"""Grid-hash vs brute-force ICP correspondence crossover (VERDICT r1
item 2 done-criterion): register a scan against targets of growing size and
report wall time for both locators + transform agreement.

Run on the real chip (default backend) or --cpu N.
"""
import os
import sys
import time

import numpy as np

from common import setup_jax, emit

SIZES = tuple(int(x) for x in os.environ.get(
    "BENCH_NN_SIZES", "10000,100000,1000000").split(","))
N_SRC = int(os.environ.get("BENCH_NN_SRC", 100_000))


def main():
    jax = setup_jax()
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.config import ICPConfig
    from vtkcloudpoint_tpu.register.icp import icp
    from vtkcloudpoint_tpu.register.nn_grid import icp_grid
    from vtkcloudpoint_tpu.ops import se3

    rng = np.random.default_rng(0)
    cfg = ICPConfig(max_iterations=20, tol=1e-10)
    r_true = np.asarray(se3.rotz(0.08), np.float32)
    t_true = np.float32([0.3, -0.2, 0.1])

    for m in SIZES:
        tgt = (rng.uniform(0, 50, (m, 3)) * [1, 1, 0.1]).astype(np.float32)
        src_idx = rng.integers(0, m, N_SRC)
        src = ((tgt[src_idx] - t_true) @ r_true).astype(np.float32)
        src += 0.01 * rng.standard_normal((N_SRC, 3)).astype(np.float32)
        sv = jnp.ones(N_SRC, bool)
        tv = jnp.ones(m, bool)
        sj, tj = jnp.asarray(src), jnp.asarray(tgt)

        def timed(fn, get_r):
            out = fn()
            _ = np.asarray(get_r(out))          # warmup + sync
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(get_r(out))
            return out, time.perf_counter() - t0

        # tile size bounded so the [chunk, m] distance block stays well
        # under HBM (a 4096 x 1M f32 tile is 16 GB -- a worker-killing
        # allocation on a 16 GB chip)
        bchunk = max(128, min(4096, (1 << 28) // max(m, 1)))
        res_b, dt_b = timed(lambda: icp(sj, sv, tj, tv, cfg, chunk=bchunk),
                            lambda o: o.r)
        # cell sized to ~10 pts/cell for the slab geometry; the build
        # (device argsort of m keys) is timed separately -- on TPU it
        # dominates the locator's wall (199 s at 1M on v5e)
        grid_max = int(os.environ.get("BENCH_NN_GRID_MAX", 200_000))
        if m > grid_max:
            # an on-chip grid-ICP at this scale is one XLA program with a
            # multi-hundred-second wall (20 iters x ~36 s/query sweep at
            # 1M) -- past the tunnel worker's watchdog; the sharded / CPU
            # paths own this regime (parallel.sharded.sharded_icp_grid)
            emit(metric="tier3_nn_crossover", target_points=m,
                 source_points=N_SRC, brute_wall_s=round(dt_b, 3),
                 grid_wall_s=None,
                 note=("grid skipped on-chip beyond BENCH_NN_GRID_MAX="
                       f"{grid_max}: single-program wall exceeds the "
                       "worker watchdog; brute (MXU) owns this size"))
            continue
        cell = max(0.25, (10.0 * (50.0 * 50.0 * 5.0) / m) ** (1.0 / 3.0))
        from vtkcloudpoint_tpu.register.nn_grid import build_nn_grid

        t0 = time.perf_counter()
        g = build_nn_grid(tj, tv, cell)
        _ = np.asarray(g.sc[:4])
        dt_build = time.perf_counter() - t0
        (res_g, ovf), dt_g = timed(
            lambda: icp_grid(sj, sv, tj, tv, cfg, cell_size=cell,
                             cell_cap=64, fallback_cap=4096),
            lambda o: o[0].r)
        dr = float(np.abs(np.asarray(res_b.r) - np.asarray(res_g.r)).max())
        dt_ = float(np.abs(np.asarray(res_b.t) - np.asarray(res_g.t)).max())
        emit(metric="tier3_nn_crossover", target_points=m,
             source_points=N_SRC,
             brute_wall_s=round(dt_b, 3), grid_wall_s=round(dt_g, 3),
             grid_build_s=round(dt_build, 3),
             speedup=round(dt_b / max(dt_g, 1e-9), 2),
             max_abs_dR=round(dr, 7), max_abs_dt=round(dt_, 7),
             grid_unresolved_overflow=int(ovf))


if __name__ == "__main__":
    main()

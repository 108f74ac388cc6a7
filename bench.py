"""Headline benchmark: DBSCAN + fusion + centroids + ICP points/sec/chip.

Runs the tier-2 configuration (BASELINE.md: 500k-pt scan, block-partitioned
DBSCAN + cross-block fusion + centroid ICP) on the default JAX backend (the
real TPU chip under the driver) and prints ONE JSON line:

    {"metric": "dbscan_icp_points_per_sec_per_chip", "value": ..., "unit":
     "points/sec", "vs_baseline": ...}

vs_baseline compares against the sequential NumPy oracle pipeline
(reference-semantics implementation, BASELINE.md: the reference publishes no
numbers, so oracle throughput measured on this host stands in as the
reference baseline). The oracle number is cached in bench_baseline.json and
measured once on a smaller cloud (oracle cost is ~linear in points at fixed
block size, see note in that file).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_POINTS = 500_000
BLOCK_CAP = 1024
EPS = 0.004
MIN_PTS = 8
NOISE_CAP = 4096
N_TRUTH = 512
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def synthetic_cloud(n, seed=0, noise_frac=0.006):
    """Dense blob field: ~n points, small noise fraction so the noise
    re-cluster fits its capacity (matches the reference's intended regime --
    most points belong to clusters)."""
    rng = np.random.default_rng(seed)
    n_noise = int(n * noise_frac)
    n_clustered = n - n_noise
    k = 600
    centers = rng.uniform(0.02, 0.98, size=(k, 2))
    per = n_clustered // k
    pts = [centers[i] + 0.0008 * rng.standard_normal((per, 2)) for i in range(k)]
    pts.append(rng.uniform(0, 1, size=(n_clustered - per * k, 2)))
    pts.append(rng.uniform(0, 1, size=(n_noise, 2)))
    motor = np.concatenate(pts)[:n].astype(np.float32)
    xyz = np.concatenate([motor, np.ones((n, 1), np.float32)], axis=1)
    truth = np.concatenate([centers, np.ones((k, 1))], axis=1).astype(np.float32)
    truth = truth[:N_TRUTH]
    return motor, xyz, truth


def tpu_pipeline():
    import jax

    # persistent compile cache: repeat bench runs skip the ~minutes-long
    # XLA compile over the device tunnel
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jaxcache") + "-dev")
    except Exception:
        pass
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.cluster.blocks import (
        assign_blocks_balanced, gather_blocks_ordered,
    )
    from vtkcloudpoint_tpu.cluster.dbscan import dbscan_blocks
    from vtkcloudpoint_tpu.cluster.fusion import merge_blocks
    from vtkcloudpoint_tpu.ops.segment import cluster_stats
    from vtkcloudpoint_tpu.register.icp import icp
    from vtkcloudpoint_tpu.config import ICPConfig

    n = N_POINTS
    max_blocks = (n + BLOCK_CAP - 1) // BLOCK_CAP

    def step(motor, xyz, valid, truth, truth_valid):
        part = assign_blocks_balanced(motor, valid, BLOCK_CAP)
        bc, bv, pidx, _ = gather_blocks_ordered(motor, part["order"], valid,
                                                max_blocks, BLOCK_CAP)
        db = dbscan_blocks(bc, bv, EPS, MIN_PTS, "l1_motor", chunk=16)
        fused = merge_blocks(db["label"], bv, bc, pidx, n, EPS, MIN_PTS,
                             "l1_motor", quirks=False,
                             noise_capacity=NOISE_CAP)
        stats = cluster_stats(xyz, motor, fused["label"], valid, 1024)
        centers = stats["center3d"]
        cvalid = stats["count"] > 0
        res = icp(centers, cvalid, truth, truth_valid,
                  ICPConfig(max_iterations=50), chunk=1024)
        return fused["label"], fused["n_total"], res.r, res.t, res.error

    motor, xyz, truth = synthetic_cloud(n)
    args = (jnp.asarray(motor), jnp.asarray(xyz), jnp.ones(n, bool),
            jnp.asarray(truth), jnp.ones(len(truth), bool))
    fn = jax.jit(step)

    def run_sync():
        out = fn(*args)
        # force real completion with host transfers (block_until_ready is
        # not a reliable barrier on the experimental axon platform)
        lab_head = np.asarray(out[0][:16])
        n_clusters = int(out[1])
        err = float(out[4])
        return n_clusters, err

    n_clusters, _ = run_sync()  # warmup / compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        n_clusters, _ = run_sync()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return n / dt, dt, n_clusters


def oracle_baseline():
    """Sequential reference-semantics oracle throughput (cached)."""
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["oracle_points_per_sec"]
    from vtkcloudpoint_tpu.oracle.pipeline_oracle import blocked_dbscan_oracle

    n_small = 20_000
    motor, _, _ = synthetic_cloud(n_small, noise_frac=0.006)
    t0 = time.perf_counter()
    blocked_dbscan_oracle(motor.astype(np.float64), EPS, MIN_PTS,
                          pts_in_cell=BLOCK_CAP)
    dt = time.perf_counter() - t0
    pps = n_small / dt
    with open(BASELINE_FILE, "w") as f:
        json.dump({
            "oracle_points_per_sec": pps,
            "note": ("Sequential NumPy oracle (reference DBSCAN semantics, "
                     f"blocked) measured on {n_small} pts of the bench cloud; "
                     "per-point cost is ~constant at fixed block size."),
            "measured_points": n_small,
            "eps": EPS, "min_pts": MIN_PTS, "block": BLOCK_CAP,
        }, f, indent=1)
    return pps


def main():
    pps, dt, n_clusters = tpu_pipeline()
    base = oracle_baseline()
    print(json.dumps({
        "metric": "dbscan_icp_points_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / base, 2),
    }))
    print(f"# n={N_POINTS} wall={dt*1000:.1f}ms clusters={n_clusters} "
          f"oracle_baseline={base:.0f} pts/s", file=sys.stderr)


if __name__ == "__main__":
    main()

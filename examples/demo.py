"""End-to-end demo: the full reference workflow, headless.

Generates a synthetic scanner session (motor angles + ranges around survey
markers), then runs: import -> distance filter -> blocked DBSCAN + fusion ->
radius rejection -> coarse alignment -> ICP -> threshold matching ->
exports (txt + .vtk scene for ParaView).

    python examples/demo.py [--cpu] [outdir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_session(tmpdir, n_markers=10, pts_per=60, noise=80, seed=0):
    """Write a synthetic scan txt file; return the marker truth table."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(8, 25, size=(n_markers, 2))
    rows = []
    for c in centers:
        m = c + 0.03 * rng.standard_normal((pts_per, 2))
        d = rng.uniform(40, 45, size=(pts_per, 1))
        rows.append(np.concatenate([m, d], axis=1))
    rows.append(np.concatenate([
        rng.uniform(8, 25, size=(noise, 2)),
        rng.uniform(40, 45, size=(noise, 1)),
    ], axis=1))
    data = np.concatenate(rows)
    rng.shuffle(data)
    path = os.path.join(tmpdir, "scan0.txt")
    with open(path, "w") as f:
        for r in data:
            f.write(f"{r[0]:.6f}\t{r[1]:.6f}\t{r[2]:.6f}\n")
    return centers


def main():
    outdir = next((a for a in sys.argv[1:] if not a.startswith("--")),
                  "/tmp/vtkcloudpoint_demo")
    os.makedirs(outdir, exist_ok=True)

    from vtkcloudpoint_tpu.config import (
        EngineConfig, ClusterConfig, ICPConfig, FilterConfig,
    )
    from vtkcloudpoint_tpu.engine import Engine
    from vtkcloudpoint_tpu.utils.progress import ProgressReporter

    centers_truth = make_session(outdir)
    cfg = EngineConfig(
        cluster=ClusterConfig(eps=0.12, min_pts=10, pts_in_cell=128),
        filters=FilterConfig(dis_min=10.0, dis_max=100.0),
        icp=ICPConfig(max_iterations=80, match_distance=1.0),
    )
    eng = Engine(cfg)
    rep = ProgressReporter(total_stages=6)

    with rep.stage("import"):
        batch, names = eng.import_folder(outdir)
    with rep.stage("distance filter"):
        batch = eng.filter_by_distance(batch, 10.0, 100.0)
    with rep.stage("cluster"):
        res = eng.cluster(batch, max_clusters=256, cluster_capacity=256,
                          max_blocks=64)
    with rep.stage("radius rejection"):
        batch, rejected = eng.reject_by_radius(batch, res, radius=5.0)
    with rep.stage("register + match"):
        truth = np.asarray(res.center3d)[np.asarray(res.count) > 0]
        reg = eng.register_to_truth(res, truth)
        matches = eng.match(res, truth, reg)
    with rep.stage("export"):
        eng.export_scene(os.path.join(outdir, "scene"), batch, res)
        eng.export_centroids(os.path.join(outdir, "centroids.txt"), res)
        eng.export_cluster_points(os.path.join(outdir, "points.txt"),
                                  batch, res)

    print(f"scan points: {int(batch.count)}")
    print(f"clusters: {int(res.n_clusters)} (true markers: "
          f"{len(centers_truth)})")
    print(f"icp: {int(reg.iterations)} iters, converged="
          f"{bool(reg.converged)}")
    print(f"matched: {int(matches['n_matched'])}, rmse="
          f"{float(matches['rmse']):.3g}")
    print(f"outputs in {outdir}: scene_points.vtk scene_circles.vtk "
          f"centroids.txt points.txt")


if __name__ == "__main__":
    main()

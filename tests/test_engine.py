"""Engine facade: the full reference workflow end-to-end (tier-1 acceptance
shape: import -> filter -> cluster -> reject -> register -> match -> export)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.config import (
    EngineConfig, ClusterConfig, ICPConfig, ImportConfig,
)
from vtkcloudpoint_tpu.engine import Engine


@pytest.fixture
def scan_folder(tmp_path, rng):
    """Synthetic scan: clusters of motor-space points around marker truths."""
    k = 8
    centers = rng.uniform(5, 25, size=(k, 2))
    rows = []
    for c in centers:
        pts = c + 0.02 * rng.standard_normal((40, 2))
        d = rng.uniform(50, 60, size=40)
        rows.append(np.concatenate([pts, d[:, None]], axis=1))
    noise = np.concatenate([rng.uniform(5, 25, size=(40, 2)),
                            rng.uniform(50, 60, size=(40, 1))], axis=1)
    rows.append(noise)
    data = np.concatenate(rows)
    rng.shuffle(data)
    p = tmp_path / "scan0.txt"
    with open(p, "w") as f:
        for r in data:
            f.write(f"{r[0]:.6f}\t{r[1]:.6f}\t{r[2]:.6f}\n")
    return str(tmp_path), centers


def test_full_workflow(scan_folder, tmp_path):
    folder, centers = scan_folder
    cfg = EngineConfig(
        imports=ImportConfig(dedup=True),
        cluster=ClusterConfig(eps=0.08, min_pts=8, pts_in_cell=64),
        icp=ICPConfig(max_iterations=60, match_distance=1.0),
    )
    eng = Engine(cfg)
    batch, names = eng.import_folder(folder)
    assert names == ["scan0"]
    assert int(batch.count) == 360

    batch = eng.filter_by_distance(batch, 10.0, 100.0)
    assert int(batch.count) == 360  # all within window

    res = eng.cluster(batch, max_clusters=128, cluster_capacity=128,
                      max_blocks=128)
    assert int(res.n_clusters) >= 8  # all real blobs found
    live = np.asarray(res.count)[1:] > 0
    assert live.sum() >= 8

    # reject nothing at huge radius, everything at tiny
    b2, rejected = eng.reject_by_radius(batch, res, radius=1e9)
    assert int(b2.count) == int(batch.count)

    # truth = the generating centers in XYZ space (use cluster centroids'
    # frame: motor coords ~ xyz[:, :2] here after conversion scale)
    truth = np.asarray(res.center3d)[np.asarray(res.count) > 0]
    reg = eng.register_to_truth(res, truth, coarse=True)
    m = eng.match(res, truth, reg, coarse=True)
    assert int(m["n_matched"]) >= 8
    assert float(m["rmse"]) < 1.0

    prefix = str(tmp_path / "scene")
    eng.export_scene(prefix, batch, res)
    assert os.path.exists(prefix + "_points.vtk")
    eng.export_centroids(str(tmp_path / "cen.txt"), res)
    eng.export_cluster_points(str(tmp_path / "pts.txt"), batch, res)
    assert os.path.getsize(tmp_path / "cen.txt") > 0


def test_determinism(scan_folder):
    folder, _ = scan_folder
    cfg = EngineConfig(cluster=ClusterConfig(eps=0.08, min_pts=8,
                                             pts_in_cell=64))
    eng = Engine(cfg)
    batch, _ = eng.import_folder(folder)
    r1 = eng.cluster(batch, max_clusters=128, cluster_capacity=128,
                     max_blocks=128)
    r2 = eng.cluster(batch, max_clusters=128, cluster_capacity=128,
                     max_blocks=128)
    np.testing.assert_array_equal(np.asarray(r1.label), np.asarray(r2.label))
    np.testing.assert_array_equal(np.asarray(r1.radius3d),
                                  np.asarray(r2.radius3d))

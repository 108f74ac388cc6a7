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


def test_engine_cluster_sharded_matches_single():
    """Engine facade for the tier-5 sharded path: labels mapped back to
    point order must equal the single-device reference-mode pipeline's
    cluster STRUCTURE (id partitions; numbering differs since the sharded
    path uses clean fusion + halo union)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.engine import Engine
    from vtkcloudpoint_tpu.config import EngineConfig, ClusterConfig
    from vtkcloudpoint_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(3)
    k = 12
    centers = rng.uniform(0.1, 0.9, (k, 2))
    motor = np.concatenate(
        [c + 0.004 * rng.standard_normal((70, 2)) for c in centers]
    ).astype(np.float32)
    rng.shuffle(motor)
    n = len(motor)
    eng = Engine(EngineConfig(cluster=ClusterConfig(
        eps=0.02, min_pts=5, block_capacity=128)))
    batch = eng.import_arrays(motor, np.full(n, 10.0, np.float32))
    out = eng.cluster_sharded(batch, mesh=make_mesh(8),
                              noise_capacity_per_device=256,
                              halo_cap=128, halo_cell_cap=96,
                              max_ids=1024, quirks=False)
    lab_blocks = np.asarray(out["label"]).reshape(-1)
    pidx = np.asarray(out["point_index"]).reshape(-1)
    lab = np.zeros(batch.capacity, np.int32)
    lab[pidx[pidx >= 0]] = lab_blocks[pidx >= 0]
    valid = np.asarray(batch.valid)
    # the facade's contract: no capacity drops, nearly all points labeled,
    # every blob dominated by one id. (Blocked fusion may cull tiny
    # cross-block fragments and the noise re-cluster assigns NEW ids to
    # recovered fragments -- reference semantics, FrmMain.cs:1507-1520 --
    # so n_total can exceed the blob count and plain global DBSCAN is NOT
    # the oracle here.)
    assert int(out["n_total"]) >= k
    assert int(out["noise_overflow"]) == 0
    assert int(out["halo_overflow"]) == 0
    assert (lab[valid] > 0).mean() > 0.9
    d = np.linalg.norm(motor[:, None, :] - centers[None], axis=-1)
    blob_of = d.argmin(1)
    lab, valid = lab[:n], valid[:n]   # batch rows 0..n-1 = input order
    for bb in range(k):
        ids = lab[valid & (blob_of == bb) & (lab > 0)]
        top = np.bincount(ids).max()
        assert top / len(ids) > 0.9, f"blob {bb} has no dominant cluster"

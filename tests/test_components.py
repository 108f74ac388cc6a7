"""Coverage tests for the remaining component inventory: coarse alignment,
seeded clustering, polygon ops, linalg, matlab adapter, fixed points, viz,
checkpoint, profiling."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from vtkcloudpoint_tpu.register.coarse import (
    auto_rescale_centers, rescale_region_truth, RegionBox, points_in_box,
    translate_points, zoom_points,
)
from vtkcloudpoint_tpu.cluster.seeded import seeded_labels
from vtkcloudpoint_tpu.cluster.dbscan import dbscan_matlab_convention
from vtkcloudpoint_tpu.ops.polygon import (
    polygon_area, polygon_centroid, point_in_polygon, is_convex,
    triangulate_earclip,
)
from vtkcloudpoint_tpu.ops.linalg import jacobi_eigh
from vtkcloudpoint_tpu.workflows.fixed_points import (
    import_fixed_points, fixed_point_centroids, match_by_name,
    parse_truth_csv,
)
from vtkcloudpoint_tpu.utils.checkpoint import save, restore, CheckpointManager
from vtkcloudpoint_tpu.utils.profiling import Stopwatch, dbscan_distance_evals
from vtkcloudpoint_tpu.viz import vtkio
from vtkcloudpoint_tpu.oracle.dbscan_oracle import dbscan_oracle
from vtkcloudpoint_tpu.config import ImportConfig


# ---- coarse alignment (C22) ----

def test_auto_rescale_matches_reference_formula(rng):
    centers = rng.uniform(0, 2, size=(10, 2))
    truth = rng.uniform(-5, 5, size=(8, 2))
    tmp, scale, bounds = auto_rescale_centers(
        jnp.asarray(centers), jnp.ones(10, bool),
        jnp.asarray(truth), jnp.ones(8, bool))
    sx = (truth[:, 0].max() - truth[:, 0].min()) / (
        centers[:, 0].max() - centers[:, 0].min())
    sy = (truth[:, 1].max() - truth[:, 1].min()) / (
        centers[:, 1].max() - centers[:, 1].min())
    np.testing.assert_allclose(np.asarray(scale), [sx, sy], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tmp),
                               centers * np.array([sx, sy]), rtol=1e-12)
    # rescaled extents match truth extents
    np.testing.assert_allclose(
        np.asarray(tmp)[:, 0].max() - np.asarray(tmp)[:, 0].min(),
        truth[:, 0].max() - truth[:, 0].min(), rtol=1e-12)


def test_region_rescale_spans_full_extent(rng):
    truth = rng.uniform(0, 10, size=(20, 2))
    bounds = jnp.asarray([truth[:, 0].min(), truth[:, 0].max(),
                          truth[:, 1].min(), truth[:, 1].max()])
    mask = np.zeros(20, bool)
    mask[:8] = True
    tmp = np.asarray(rescale_region_truth(jnp.asarray(truth),
                                          jnp.asarray(mask), bounds))
    sel = tmp[mask]
    np.testing.assert_allclose(sel[:, 0].min(), truth[:, 0].min(), rtol=1e-12)
    np.testing.assert_allclose(sel[:, 0].max(), truth[:, 0].max(), rtol=1e-12)


def test_region_box_ops():
    box = RegionBox(0, 0, 2, 2)
    assert box.translate(1, -1) == RegionBox(1, -1, 3, 1)
    z = box.zoom(0.5)
    assert z == RegionBox(0.5, 0.5, 1.5, 1.5)
    xy = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [2.1, 1.0]])
    m = np.asarray(points_in_box(xy, box))
    # (min, max] semantics: corner at min excluded, at max included
    np.testing.assert_array_equal(m, [False, True, True, False])
    np.testing.assert_allclose(np.asarray(translate_points(xy, 1, 2))[0],
                               [1, 2])
    np.testing.assert_allclose(np.asarray(zoom_points(xy, 2))[1], [2, 2])


# ---- seeded clustering (C23) ----

def test_seeded_labels(rng):
    truth = rng.uniform(0, 10, size=(5, 2))
    ids = jnp.arange(1, 6, dtype=jnp.int32)
    pts = np.concatenate([
        truth[2] + 0.01 * rng.standard_normal((30, 2)),
        truth[4] + 0.01 * rng.standard_normal((20, 2)),
        np.full((10, 2), 100.0),
    ])
    lab, n_ok, n_noise = seeded_labels(
        jnp.asarray(pts), jnp.ones(60, bool), jnp.asarray(truth),
        jnp.ones(5, bool), ids, cluster_radius=0.5)
    lab = np.asarray(lab)
    assert (lab[:30] == 3).all()
    assert (lab[30:50] == 5).all()
    assert (lab[50:] == 0).all()
    assert int(n_ok) == 50 and int(n_noise) == 10


# ---- matlab adapter (C21) ----

def test_matlab_convention(rng):
    pts = np.concatenate([
        rng.standard_normal((40, 2)) * 0.05,
        rng.standard_normal((40, 2)) * 0.05 + 5,
        np.array([[50.0, 50.0]]),
    ])
    lab, k = dbscan_matlab_convention(pts, 5, 0.3)
    lab = np.asarray(lab)
    ref, kr, _ = dbscan_oracle(pts, 0.3, 5, metric="l2_xyz")
    np.testing.assert_array_equal(lab, np.where(ref == 0, -1, ref))
    assert int(k) == kr == 2
    assert lab[-1] == -1


# ---- polygon ops (C16) ----

def test_polygon_area_centroid():
    # unit square, CCW
    v = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    valid = jnp.ones(4, bool)
    assert np.isclose(float(polygon_area(v, valid)), 1.0)
    np.testing.assert_allclose(np.asarray(polygon_centroid(v, valid)),
                               [0.5, 0.5], atol=1e-12)
    # padded
    vp = jnp.concatenate([v, jnp.zeros((4, 2))])
    validp = jnp.asarray([True] * 4 + [False] * 4)
    assert np.isclose(float(polygon_area(vp, validp)), 1.0)


def test_point_in_polygon():
    v = jnp.asarray([[0.0, 0], [2, 0], [2, 2], [0, 2]])
    valid = jnp.ones(4, bool)
    pts = jnp.asarray([[1.0, 1.0], [3.0, 1.0], [-0.5, 1.0], [1.0, 1.9]])
    m = np.asarray(point_in_polygon(pts, v, valid))
    np.testing.assert_array_equal(m, [True, False, False, True])


def test_is_convex():
    sq = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    assert bool(is_convex(sq, jnp.ones(4, bool)))
    concave = jnp.asarray([[0.0, 0], [2, 0], [1, 0.5], [2, 2], [0, 2]])
    assert not bool(is_convex(concave, jnp.ones(5, bool)))


def test_triangulation():
    sq = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    tris = triangulate_earclip(sq)
    assert len(tris) == 2
    concave = np.array([[0.0, 0], [2, 0], [2, 2], [1, 0.5], [0, 2]])
    tris = triangulate_earclip(concave)
    assert len(tris) == 3
    # triangle areas sum to polygon area
    def tri_area(t):
        a, b, c = concave[t[0]], concave[t[1]], concave[t[2]]
        return abs((b[0]-a[0])*(c[1]-a[1]) - (b[1]-a[1])*(c[0]-a[0])) / 2
    x, y = concave[:, 0], concave[:, 1]
    poly_area = abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2
    assert np.isclose(sum(tri_area(t) for t in tris), poly_area)


# ---- linalg (C17) ----

def test_jacobi_eigh_matches_numpy(rng):
    for n in (3, 4, 6):
        a = rng.standard_normal((n, n))
        a = (a + a.T) / 2
        w, v = jacobi_eigh(jnp.asarray(a))
        wn = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(np.asarray(w), wn, atol=1e-10)
        # eigenvector property
        for i in range(n):
            r = a @ np.asarray(v)[:, i] - float(w[i]) * np.asarray(v)[:, i]
            assert np.abs(r).max() < 1e-9


# ---- fixed points (C24) ----

def test_fixed_point_workflow(tmp_path, rng):
    # two marker files with duplicates
    for name, base in [("m1", (1.0, 2.0)), ("m2", (3.0, 4.0))]:
        with open(tmp_path / f"{name}.txt", "w") as f:
            for _ in range(3):
                f.write(f"{base[0]}\t{base[1]}\t10.0\n")   # exact dup x3
            f.write(f"{base[0] + 0.1}\t{base[1]}\t10.0\n")
    fps = import_fixed_points(str(tmp_path), ImportConfig(dedup=True))
    assert fps.names == ["m1", "m2"]
    assert len(fps.xyz) == 4  # 2 unique per file
    np.testing.assert_array_equal(np.sort(fps.mult), [1, 1, 3, 3])
    cen_w = fixed_point_centroids(fps, weighted=True)
    cen_u = fixed_point_centroids(fps, weighted=False)
    assert cen_w.shape == (2, 3)
    assert not np.allclose(cen_w, cen_u)  # weighting matters

    truth_file = tmp_path / "truth.csv"
    truth_file.write_text("m2,10,11,12\nm3,0,0,0\nm1 1 2 3\n")
    names, txyz = parse_truth_csv(str(truth_file))
    mi, ti = match_by_name(fps.names, names, txyz)
    assert list(mi) == [0, 1]
    assert names[ti[0]] == "m1" and names[ti[1]] == "m2"


# ---- viz (C25) ----

def test_vtk_writers(tmp_path, rng):
    xyz = rng.standard_normal((10, 3))
    labels = np.arange(10)
    p = str(tmp_path / "pts.vtk")
    vtkio.write_points_vtk(p, xyz, labels)
    content = open(p).read()
    assert "POINTS 10 float" in content and "SCALARS cluster_id" in content
    vtkio.write_circles_vtk(str(tmp_path / "c.vtk"),
                            np.array([[0.0, 0], [1, 1]]),
                            np.array([1.0, 0.0]))  # second circle skipped
    c = open(tmp_path / "c.vtk").read()
    assert "LINES 1" in c
    vtkio.write_lines_vtk(str(tmp_path / "l.vtk"),
                          np.zeros((3, 3)), np.ones((3, 3)))
    assert "LINES 3" in open(tmp_path / "l.vtk").read()
    vtkio.write_box_vtk(str(tmp_path / "b.vtk"), 0, 0, 1, 1)
    assert "LINES 1 6" in open(tmp_path / "b.vtk").read()


# ---- checkpoint ----

def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {"a": rng.standard_normal((4, 3)), "b": [np.arange(5),
            {"c": np.float64(2.5)}]}
    p = save(str(tmp_path / "ck.npz"), tree, step=7)
    back, step = restore(p, tree)
    assert step == 7
    np.testing.assert_array_equal(back["a"], tree["a"])
    np.testing.assert_array_equal(back["b"][0], tree["b"][0])

    mgr = CheckpointManager(str(tmp_path / "mgr"), keep=2)
    for s in (1, 2, 3):
        mgr.save(s, tree)
    assert mgr.latest_step() == 3
    assert not os.path.exists(tmp_path / "mgr" / "ckpt_1.npz")
    got, s = mgr.restore_latest(tree)
    assert s == 3
    np.testing.assert_array_equal(got["a"], tree["a"])


def test_stopwatch_and_counters():
    import jax.numpy as jnp2
    with Stopwatch() as sw:
        x = jnp2.arange(1000).sum()
        sw.sync(x)
    assert sw.elapsed > 0
    assert dbscan_distance_evals(10, 256) == 10 * 256 * 256


def test_progress_reporter():
    from vtkcloudpoint_tpu.utils.progress import ProgressReporter
    msgs = []
    rep = ProgressReporter(total_stages=2, sink=msgs.append)
    with rep.stage("a"):
        pass
    with rep.stage("b"):
        pass
    assert len(msgs) == 2 and "a" in rep.summary() and "b" in rep.summary()
    assert msgs[0].startswith("[1/2]")


def test_engine_cluster_grid(rng):
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.engine import Engine
    from vtkcloudpoint_tpu.config import EngineConfig, ClusterConfig
    from tests.conftest import make_blobs
    motor = make_blobs(rng, n_clusters=4, pts_per=30, noise=20, spread=0.01)
    eng = Engine(EngineConfig(cluster=ClusterConfig(eps=0.06, min_pts=9)))
    batch = eng.import_arrays(motor, np.full(len(motor), 10.0))
    out, stats = eng.cluster_grid(batch, cell_cap=64, max_clusters=64)
    assert int(out["n_clusters"]) >= 3
    assert int(out["overflow"]) == 0

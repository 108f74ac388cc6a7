"""IO: native parser vs fallback, dedup, export round-trips."""
import os

import numpy as np
import pytest

from vtkcloudpoint_tpu.io.loaders import (
    load_scan_txt, load_folder, dedup_exact, export_centroids,
    export_cluster_points, _native_lib,
)


@pytest.fixture
def scan_file(tmp_path, rng):
    data = rng.uniform(-30, 30, size=(500, 3))
    data[:, 2] = rng.uniform(1, 900, size=500)
    p = tmp_path / "scan.txt"
    with open(p, "w") as f:
        for r in data:
            f.write(f"{r[0]:.6f}\t{r[1]:.6f}\t{r[2]:.6f}\n")
    return str(p), data


def test_native_parser_builds():
    assert _native_lib() is not None, "native fastparse should build with g++"


def test_load_native_matches_fallback(scan_file):
    path, data = scan_file
    a = load_scan_txt(path, use_native=True)
    b = load_scan_txt(path, use_native=False)
    np.testing.assert_allclose(a, b, atol=1e-12)
    np.testing.assert_allclose(a, np.round(data, 6), atol=1e-9)


def test_load_skips_garbage(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1.0\t2.0\t3.0\nheader line\n4.0\t5.0\t6.0\n\n7 8 9\n")
    a = load_scan_txt(str(p), use_native=True)
    b = load_scan_txt(str(p), use_native=False)
    np.testing.assert_allclose(a, b)
    assert len(a) == 3


def test_load_folder(tmp_path):
    for i in range(3):
        with open(tmp_path / f"s{i}.txt", "w") as f:
            for j in range(10 + i):
                f.write(f"{i}.0\t{j}.0\t{i + j}.0\n")
    data, pid, names = load_folder(str(tmp_path))
    assert names == ["s0", "s1", "s2"]
    assert len(data) == 10 + 11 + 12
    np.testing.assert_array_equal(np.bincount(pid), [10, 11, 12])


def test_dedup_exact():
    xyz = np.array([[1.0, 2, 3], [4, 5, 6], [1, 2, 3], [7, 8, 9], [1, 2, 3]])
    idx, mult = dedup_exact(xyz)
    np.testing.assert_array_equal(idx, [0, 1, 3])
    np.testing.assert_array_equal(mult, [3, 1, 1])


def test_export_roundtrip(tmp_path, rng):
    centers = rng.standard_normal((5, 3))
    p = str(tmp_path / "c.txt")
    export_centroids(p, centers, bit=6)
    back = load_scan_txt(p)
    np.testing.assert_allclose(back, np.round(centers, 6), atol=1e-9)

    labels = np.array([1, 1, 2])
    motor = rng.standard_normal((3, 2))
    dist = rng.uniform(1, 10, 3)
    p2 = str(tmp_path / "pts.txt")
    export_cluster_points(p2, labels, motor, dist, bit=4)
    lines = open(p2).read().strip().split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("1\t")


def test_path_id_through_pipeline(tmp_path):
    """3-file folder -> PointBatch.path_id -> per-file export + visibility
    (VTK checkbox-tree analog, FrmMain.cs:2497-2609)."""
    import jax.numpy as jnp
    from vtkcloudpoint_tpu.engine import Engine
    from vtkcloudpoint_tpu.config import EngineConfig, ImportConfig

    for i in range(3):
        with open(tmp_path / f"f{i}.txt", "w") as f:
            for j in range(5):
                # distinct rows per file so dedup keeps everything
                f.write(f"{i * 10 + j}.0\t{j}.0\t{5.0 + i}\n")
    eng = Engine(EngineConfig(imports=ImportConfig(dedup=True)))
    batch, names = eng.import_folder(str(tmp_path))
    assert names == ["f0", "f1", "f2"]
    pid = np.asarray(batch.path_id)[np.asarray(batch.valid)]
    np.testing.assert_array_equal(np.bincount(pid), [5, 5, 5])

    # per-file visibility: hide file 1
    vis = eng.set_file_visibility(batch, jnp.array([True, False, True]))
    pid_vis = np.asarray(vis.path_id)[np.asarray(vis.valid)]
    assert set(pid_vis.tolist()) == {0, 2}

    # per-file distance filter: gate only file 2 (rng == 7.0 there)
    filt = eng.filter_by_distance(batch, 0.0, 6.5, path_id=2)
    pid_f = np.asarray(filt.path_id)[np.asarray(filt.valid)]
    assert set(pid_f.tolist()) == {0, 1}  # file 2 fully filtered
    filt01 = eng.filter_by_distance(batch, 0.0, 6.5, path_id=0)
    assert np.asarray(filt01.valid).sum() == 15  # file 0 rng=5 passes

    # per-file cluster export
    from vtkcloudpoint_tpu.cluster.pipeline import ClusterResult
    lab = jnp.where(batch.valid, 1, 0).astype(jnp.int32)
    res_label = lab
    # minimal fake result carrying only what export needs
    class R:
        label = res_label
    p = str(tmp_path / "file1_pts.txt")
    eng.export_cluster_points(p, batch, R, path_id=1)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 5
    assert all(ln.split("\t")[1].startswith("1") for ln in lines)


def test_fastparse_count_is_tight(tmp_path):
    """Exact newline-count bound: buffer ~= rows, not len/2 (VERDICT weak 4)."""
    lib = _native_lib()
    assert lib is not None
    p = tmp_path / "tight.txt"
    n = 1000
    with open(p, "w") as f:
        for i in range(n):
            f.write(f"{i}.123456\t{i}.654321\t{i % 900}.000000\n")
    cap = lib.fastparse_count(str(p).encode(), 0)
    assert n <= cap <= n + 1  # one per line (+1 no-trailing-newline slack)


def test_gb2312_decode(tmp_path):
    from vtkcloudpoint_tpu.io.loaders import read_text_lines
    from vtkcloudpoint_tpu.workflows.fixed_points import parse_truth_csv

    p = tmp_path / "gb.txt"
    # marker names in GB2312 (Chinese), numeric truth columns
    content = "标记一 1.5 2.5 3.5\n标记二 4.0 5.0 6.0\n"
    p.write_bytes(content.encode("gb2312"))
    lines = read_text_lines(str(p))
    assert lines[0].startswith("标记一")
    names, xyz = parse_truth_csv(str(p))
    assert names == ["标记一", "标记二"]
    np.testing.assert_allclose(xyz[0], [1.5, 2.5, 3.5])


def test_sniff_decimals(tmp_path):
    from vtkcloudpoint_tpu.io.loaders import sniff_decimals

    p = tmp_path / "s.txt"
    p.write_text("12.345678\t1.0\t5.0\n")
    assert sniff_decimals(str(p)) == 6
    p2 = tmp_path / "s2.txt"
    p2.write_text("# header junk\n-3.14\t1.0\t5.0\n")
    assert sniff_decimals(str(p2)) == 2
    p3 = tmp_path / "s3.txt"  # no decimal point: C# LastIndexOf(-1) -> len
    p3.write_text("123\t1\t5\n")
    assert sniff_decimals(str(p3)) == 3

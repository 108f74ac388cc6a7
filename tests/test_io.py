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

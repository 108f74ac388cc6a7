"""Headless snapshot / legend / PNG writer (C25 2D views, C29 Tools.Screen)."""
import struct
import zlib

import numpy as np

from vtkcloudpoint_tpu.viz.snapshot import (
    write_png, rasterize_points, label_colors, legend_entries,
    snapshot_clusters,
)


def _read_png_size(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h, data


def test_png_roundtrip(tmp_path):
    rgb = np.zeros((4, 5, 3), np.uint8)
    rgb[1, 2] = [255, 10, 20]
    p = write_png(str(tmp_path / "t.png"), rgb)
    w, h, data = _read_png_size(p)
    assert (w, h) == (5, 4)
    # decode IDAT and compare pixels
    idat = data[data.index(b"IDAT") + 4:]
    raw = zlib.decompress(idat[: len(idat) - 12])
    rows = np.frombuffer(raw, np.uint8).reshape(4, 1 + 5 * 3)
    assert (rows[:, 0] == 0).all()
    np.testing.assert_array_equal(rows[:, 1:].reshape(4, 5, 3), rgb)


def test_rasterize_scatter():
    xy = np.array([[0.0, 0.0], [1.0, 1.0]])
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    img = rasterize_points(xy, colors, width=10, height=10,
                           bounds=(0, 0, 1, 1))
    assert tuple(img[9, 0]) == (255, 0, 0)     # origin -> bottom-left
    assert tuple(img[0, 9]) == (0, 255, 0)     # (1,1) -> top-right


def test_labels_and_legend(tmp_path, rng):
    n = 200
    motor = rng.uniform(0, 1, (n, 2))
    xyz = np.concatenate([motor, np.ones((n, 1))], axis=1)
    labels = np.zeros(n, np.int32)
    labels[:80] = 1
    labels[80:150] = 2
    colors = label_colors(labels)
    assert (colors[:80] == colors[0]).all()
    assert tuple(colors[151]) == (90, 90, 90)  # noise gray
    entries = legend_entries(labels)
    assert [e[0] for e in entries] == [1, 2]
    assert entries[0][2] == 80 and entries[1][2] == 70
    p = snapshot_clusters(str(tmp_path / "scene"), xyz=xyz, motor=motor,
                          labels=labels, valid=np.ones(n, bool),
                          view="motor", width=64, height=64)
    w, h, _ = _read_png_size(p)
    assert (w, h) == (64, 64)
    legend = open(p[:-4] + ".legend.txt").read().splitlines()
    assert legend[0].startswith("id\t") and len(legend) == 3


def test_engine_screenshot(tmp_path, rng):
    from vtkcloudpoint_tpu.engine import Engine
    from vtkcloudpoint_tpu.config import EngineConfig, ClusterConfig
    from tests.conftest import make_blobs

    eng = Engine(EngineConfig(cluster=ClusterConfig(
        eps=0.06, min_pts=6, block_capacity=128)))
    motor = make_blobs(rng, n_clusters=3, pts_per=30, noise=20, spread=0.01)
    batch = eng.import_arrays(motor, np.full(len(motor), 5.0))
    res = eng.cluster(batch, max_blocks=8, max_clusters=64,
                      cluster_capacity=128, noise_capacity=128, max_hull=16)
    p = eng.screenshot(str(tmp_path / "shot"), batch, res, view="motor")
    assert p.endswith(".png")
    w, h, _ = _read_png_size(p)
    assert (w, h) == (800, 600)

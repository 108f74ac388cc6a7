"""BIFF8 .xls reader: round-trip against a minimal in-test writer."""
import struct

import numpy as np
import pytest

from vtkcloudpoint_tpu.io.xls import read_xls_numeric, load_scan_xls


def _biff_workbook_stream(rows):
    """Globals BOF/EOF + one worksheet with NUMBER records."""
    def rec(rid, body):
        return struct.pack("<HH", rid, len(body)) + body

    bof_globals = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    eof = rec(0x000A, b"")
    bof_sheet = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    cells = b""
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            cells += rec(0x0203, struct.pack("<HHHd", r, c, 0, float(v)))
    stream = bof_globals + eof + bof_sheet + cells + eof
    # pad past the 4096-byte mini-stream cutoff with an ignorable record
    if len(stream) < 4200:
        pad = 4200 - len(stream)
        stream += rec(0x005C, b"\x20" * pad)
    return stream


def _ole2_wrap(stream: bytes) -> bytes:
    """Minimal OLE2 compound file with one 'Workbook' stream."""
    sec = 512
    n_stream_secs = -(-len(stream) // sec)
    dir_sec = n_stream_secs
    fat_sec = n_stream_secs + 1

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version
    struct.pack_into("<H", header, 28, 0xFFFE)   # little endian
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini sector shift
    struct.pack_into("<I", header, 44, 1)        # num FAT sectors
    struct.pack_into("<i", header, 48, dir_sec)  # directory start
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<i", header, 60, -2)       # minifat start
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<i", header, 68, -2)       # difat start
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<i", header, 76 + 4 * i, -1)
    struct.pack_into("<i", header, 76, fat_sec)

    def dir_entry(name, etype, start, size, child=-1):
        e = bytearray(128)
        enc = name.encode("utf-16-le") + b"\x00\x00"
        e[0:len(enc)] = enc
        struct.pack_into("<H", e, 64, len(enc))
        e[66] = etype
        struct.pack_into("<i", e, 68, -1)   # left sibling
        struct.pack_into("<i", e, 72, -1)   # right sibling
        struct.pack_into("<i", e, 76, child)
        struct.pack_into("<i", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    directory = (
        dir_entry("Root Entry", 5, -2, 0, child=1)
        + dir_entry("Workbook", 2, 0, len(stream))
        + bytes(128) * 2
    )

    fat = bytearray()
    for i in range(n_stream_secs - 1):
        fat += struct.pack("<i", i + 1)
    fat += struct.pack("<i", -2)          # end of stream chain
    fat += struct.pack("<i", -2)          # directory chain
    fat += struct.pack("<i", -3)          # FAT sector marker
    fat += struct.pack("<i", -1) * ((sec - len(fat)) // 4)

    body = stream + bytes((-len(stream)) % sec)
    return bytes(header) + body + directory + bytes(fat)


@pytest.fixture
def xls_file(tmp_path, rng):
    rows = rng.uniform(-100, 100, size=(40, 3))
    path = tmp_path / "scan.xls"
    path.write_bytes(_ole2_wrap(_biff_workbook_stream(rows)))
    return str(path), rows


def test_read_numeric_grid(xls_file):
    path, rows = xls_file
    grid = read_xls_numeric(path)
    assert grid.shape == rows.shape
    np.testing.assert_allclose(grid, rows, rtol=1e-15)


def test_load_scan_xls(xls_file):
    path, rows = xls_file
    out = load_scan_xls(path)
    np.testing.assert_allclose(out, rows, rtol=1e-15)


def test_rk_decoding(tmp_path):
    """RK-encoded cells (integers and doubles/100)."""
    def rec(rid, body):
        return struct.pack("<HH", rid, len(body)) + body

    bofg = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bofs = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    eof = rec(0x000A, b"")
    # RK int: 42 -> (42 << 2) | 2 ; RK int/100: 4253 -> ((425300)<<2)|3
    rk_int = rec(0x027E, struct.pack("<HHHi", 0, 0, 0, (42 << 2) | 2))
    rk_div = rec(0x027E, struct.pack("<HHHi", 0, 1, 0, (4253 << 2) | 3))
    stream = bofg + eof + bofs + rk_int + rk_div + eof
    stream += rec(0x005C, b"\x20" * (4200 - len(stream)))
    p = tmp_path / "rk.xls"
    p.write_bytes(_ole2_wrap(stream))
    grid = read_xls_numeric(str(p))
    assert grid[0, 0] == 42.0
    assert np.isclose(grid[0, 1], 42.53)

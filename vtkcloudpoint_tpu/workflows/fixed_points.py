"""Fixed-point (survey-marker) workflow.

Reference C24 (SURVEY.md): folders where each file is one known control
marker; each file becomes one cluster (AddFolder typpe 3/4,
FrmMain.cs:946-947, 1020-1089), exact duplicates collapse into a
multiplicity count, centroids are (optionally) multiplicity-weighted
(getFixedPtsCentroid, Tools.cs:78-111), and marker clusters join a truth
list BY NAME (FixedPointMatchingToolStripMenuItem_Click,
FrmMain.cs:2366-2405) for export.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..config import ImportConfig
from ..data.convert import motor_to_xyz, range_gate
from ..io.loaders import load_folder, dedup_exact


class FixedPointSet(NamedTuple):
    xyz: np.ndarray        # [N,3]
    motor: np.ndarray      # [N,2]
    rng: np.ndarray        # [N]
    mult: np.ndarray       # i64[N] duplicate multiplicity (ptsCount)
    cluster: np.ndarray    # i32[N] marker id = file index + 1
    names: list            # marker names (file basenames)


def import_fixed_points(folder: str, cfg: ImportConfig = ImportConfig(),
                        collapse_duplicates: bool = True) -> FixedPointSet:
    """typpe 3 (collapse duplicates, count them) / typpe 4 (keep, count)."""
    raw, pid, names = load_folder(folder)
    keep = np.asarray(range_gate(jnp.asarray(raw[:, 2]), cfg))
    raw, pid = raw[keep], pid[keep]
    motor = raw[:, :2]
    rng = raw[:, 2]
    xyz = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(rng), cfg))
    if collapse_duplicates:
        # dedup within each marker file (reference dedups per cluster list)
        keep_idx, mult = [], []
        for i in range(len(names)):
            m = np.nonzero(pid == i)[0]
            ki, mu = dedup_exact(xyz[m])
            keep_idx.append(m[ki])
            mult.append(mu)
        keep_idx = np.concatenate(keep_idx) if keep_idx else np.zeros(0, int)
        mult = np.concatenate(mult) if mult else np.zeros(0, int)
        xyz, motor, rng, pid = xyz[keep_idx], motor[keep_idx], rng[keep_idx], pid[keep_idx]
    else:
        mult = np.ones(len(xyz), np.int64)
    return FixedPointSet(xyz=xyz, motor=motor, rng=rng, mult=mult,
                         cluster=(pid + 1).astype(np.int32), names=names)


def fixed_point_centroids(fps: FixedPointSet, weighted: bool = True):
    """Per-marker centroid [K,3]; weighted=False ignores multiplicity
    (getFixedPtsCentroid isIgnoreDuplication flag, Tools.cs:88-101)."""
    k = len(fps.names)
    out = np.zeros((k, 3))
    for i in range(k):
        m = fps.cluster == i + 1
        w = fps.mult[m].astype(float) if weighted else np.ones(m.sum())
        out[i] = (fps.xyz[m] * w[:, None]).sum(0) / max(w.sum(), 1.0)
    return out


def match_by_name(names: list, truth_names: list, truth_xyz: np.ndarray):
    """Name-join marker centroids to truth entries (FrmMain.cs:2366-2405).

    Returns (marker_idx i64[M], truth_idx i64[M]) for names present in both.
    """
    tmap = {n: i for i, n in enumerate(truth_names)}
    mi, ti = [], []
    for i, n in enumerate(names):
        if n in tmap:
            mi.append(i)
            ti.append(tmap[n])
    return np.array(mi, np.int64), np.array(ti, np.int64)


def parse_truth_csv(path: str):
    """Truth marker file: 'name x y z' or 'name,x,y,z' per line
    (FixedPtsMatch_Export.cs:20-78). Returns (names, xyz [K,3]).
    GB2312-tolerant decode (marker names are Chinese in the reference's
    data; FileMap.cs:16-33)."""
    from ..io.loaders import read_text_lines

    names, rows = [], []
    for line in read_text_lines(path):
        parts = line.replace(",", " ").split()
        if len(parts) >= 4:
            try:
                rows.append([float(parts[1]), float(parts[2]),
                             float(parts[3])])
            except ValueError:
                continue
            names.append(parts[0])
    return names, np.array(rows).reshape(-1, 3)


def export_fixed_point_matches(path: str, fps: FixedPointSet,
                               centroids: np.ndarray, truth_names: list,
                               truth_xyz: np.ndarray, bit: int = 4):
    """Per-marker export: name, centroid, matched truth coordinates."""
    mi, ti = match_by_name(fps.names, truth_names, truth_xyz)
    with open(path, "w") as f:
        for a, b in zip(mi, ti):
            c = centroids[a]
            t = truth_xyz[b]
            f.write(
                f"{fps.names[a]}\t{c[0]:.{bit}f}\t{c[1]:.{bit}f}\t"
                f"{c[2]:.{bit}f}\t{t[0]:.{bit}f}\t{t[1]:.{bit}f}\t"
                f"{t[2]:.{bit}f}\n"
            )
    return len(mi)

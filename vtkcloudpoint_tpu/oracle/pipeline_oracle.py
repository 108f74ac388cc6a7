"""NumPy oracle for the blocked clustering pipeline.

Sequential transcription of the reference flow (deterministic clean-grid
spec, see cluster/blocks.py parity note):
  partition (FrmMain.cs:1214-1291) -> per-block DBSCAN (StartCode,
  FrmMain.cs:2782-2794) -> CompleteWork3 merge with the reference's exact
  idLast/clusLen loop (FrmMain.cs:1432-1544) -> noise re-cluster seeded at
  clusterSum - delSum - 1 (FrmMain.cs:1509).

The merge here is a line-faithful behavioral transcription (including the
first-run overcount and last-run cull escape); the engine's closed-form keep
rules are validated against it.
"""
from __future__ import annotations

import numpy as np

from .dbscan_oracle import dbscan_oracle


def partition_reference_oracle(motor: np.ndarray, pts_in_cell: int):
    """Clean-grid deterministic partition (same spec as
    cluster.blocks.assign_blocks_reference)."""
    x, y = motor[:, 0], motor[:, 1]
    xmin, ymin, xmax, ymax = x.min(), y.min(), x.max(), y.max()
    key = np.maximum(x - xmin, y - ymin)
    order = np.argsort(key, kind="stable")
    seed = order[:pts_in_cell]
    cell_x = (x[seed] - xmin).max()
    cell_y = (y[seed] - ymin).max()
    if cell_x <= 0:
        cell_x = max(xmax - xmin, 1.0)
    if cell_y <= 0:
        cell_y = max(ymax - ymin, 1.0)
    cols = int((xmax - xmin) / cell_x) + 1
    rows = int((ymax - ymin) / cell_y) + 1
    col = np.clip(np.ceil((x - xmin) / cell_x).astype(int) - 1, 0, cols - 1)
    row = np.clip(np.ceil((y - ymin) / cell_y).astype(int) - 1, 0, rows - 1)
    return row * cols + col, rows * cols


def blocked_dbscan_oracle(
    motor: np.ndarray,
    eps: float,
    min_pts: int,
    pts_in_cell: int,
    min_cluster_size: int = 3,
    metric: str = "l1_motor",
    coords3d: np.ndarray | None = None,
):
    """Full blocked pipeline. Returns (labels i64[N], n_total, info dict)."""
    n = len(motor)
    pts_metric = motor if metric != "l2_xyz" else coords3d
    block, n_blocks = partition_reference_oracle(motor, pts_in_cell)

    local = np.zeros(n, dtype=np.int64)
    cluster_sum = 0
    cells = []  # list of (point indices ascending)
    for b in range(n_blocks):
        idxs = np.nonzero(block == b)[0]
        cells.append(idxs)
        if len(idxs) == 0:
            continue
        lab, k, _ = dbscan_oracle(pts_metric[idxs], eps, min_pts, metric)
        local[idxs] = lab
        cluster_sum += k

    # ---- CompleteWork3 transcription ----
    glob = np.zeros(n, dtype=np.int64)
    clus_for_merge = []  # point indices in clusForMerge order
    id_now = 0
    del_sum = 0
    for b in range(n_blocks):
        idxs = cells[b]
        if len(idxs) == 0:
            continue
        # stable sort by local cluster id (reference sorts the cell in place)
        srt = idxs[np.argsort(local[idxs], kind="stable")]
        id_last = local[srt[0]]
        if id_last != 0:
            id_now += 1
            clus_len = 1
        else:
            clus_len = 0
        for j in srt:
            cid = local[j]
            if cid == 0:
                glob[j] = 0
                clus_for_merge.append(j)
            else:
                if cid != id_last:
                    if clus_len <= min_cluster_size and id_last != 0:
                        del_sum += 1
                        # rewind previous clus_len entries to noise
                        for k2 in range(clus_len):
                            glob[clus_for_merge[-1 - k2]] = 0
                    else:
                        id_now += 1
                    clus_len = 1
                else:
                    clus_len += 1
                glob[j] = id_now
                clus_for_merge.append(j)
                id_last = cid

    # ---- noise re-cluster (FrmMain.cs:1507-1520) ----
    zero_list = [j for j in clus_for_merge if glob[j] == 0]
    cf = cluster_sum - del_sum - 1  # the reference's off-by-one seed
    if zero_list:
        zpts = pts_metric[np.array(zero_list)]
        lab, k_new, _ = dbscan_oracle(zpts, eps, min_pts, metric, cf=cf)
        for t, j in enumerate(zero_list):
            glob[j] = lab[t]
    else:
        k_new = 0
    n_total = cf + k_new
    return glob, n_total, {
        "cluster_sum": cluster_sum,
        "del_sum": del_sum,
        "id_now": id_now,
        "n_blocks": n_blocks,
        "block": block,
        "local": local,
    }


def centroid_merge_oracle(centers_xy: np.ndarray, merge_eps: float,
                          merge_min_pts: int = 2):
    """MergeIDByDistance + refreshCensAndClusByDictionary transcription.

    centers_xy: [K, 2] centroid X/Y in cluster-id order (id = index + 1).
    Returns remap i64[K+1]: old id -> new dense id.
    """
    k = len(centers_xy)
    lab, _, _ = dbscan_oracle(centers_xy, merge_eps, merge_min_pts, "l1_motor")
    old_ids = np.arange(1, k + 1)
    target = old_ids.copy()
    seen = set()
    for i in range(k):
        if lab[i] != 0:
            if old_ids[i] not in seen:
                seen.add(old_ids[i])
                for q in range(k):
                    if lab[q] == lab[i] and old_ids[q] != old_ids[i]:
                        seen.add(old_ids[q])
                        target[q] = old_ids[i]
        else:
            seen.add(old_ids[i])
    survivors = sorted(set(target))
    new_of_old = {old: r + 1 for r, old in enumerate(survivors)}
    remap = np.zeros(k + 1, dtype=np.int64)
    for i in range(k):
        remap[old_ids[i]] = new_of_old[target[i]]
    return remap

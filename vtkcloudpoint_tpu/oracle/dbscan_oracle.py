"""NumPy oracle: sequential DBSCAN with the reference's exact semantics.

Faithful reimplementation (NOT a translation of code style — a transcription of
observable behavior) of reference DBImproved.cs:14-116 and DB.cs:14-115:

- metric "l1_motor":  |dx| + |dy| over motor coords (DBImproved.cs:14-25)
- metric "signed_sum_xy": dx + dy over X/Y, signed, no abs -- the legacy
  latent bug (DB.cs:14-25)
- metric "l2_xyz": sqrt(dx^2+dy^2+dz^2) over xyz (commented-out variant)
- neighborhood count INCLUDES the query point itself (distance 0)
- scan order seeds clusters: first unclassed core point -> new id = cf+1
  (DBImproved.cs:91-114); ``cf`` seeds continued numbering (FrmMain.cs:1509)
- BFS expansion marks neighbors classed; core neighbors expand; EVERY touched
  neighbor gets clusterId = c even if already classed (DBImproved.cs:87), so a
  border point ends up labeled by the LAST cluster that touches it
- noise points keep label 0 and stay unclassed (eligible for later absorption)
"""
from __future__ import annotations

import numpy as np


def pairwise_dist(pts: np.ndarray, metric: str) -> np.ndarray:
    if metric == "l1_motor":
        d = np.abs(pts[:, None, 0] - pts[None, :, 0]) + np.abs(
            pts[:, None, 1] - pts[None, :, 1]
        )
    elif metric == "signed_sum_xy":
        d = (pts[:, None, 0] - pts[None, :, 0]) + (pts[:, None, 1] - pts[None, :, 1])
    elif metric == "l2_xyz":
        diff = pts[:, None, :] - pts[None, :, :]
        d = np.sqrt((diff**2).sum(-1))
    else:
        raise ValueError(metric)
    return d


def dbscan_oracle(pts: np.ndarray, eps: float, min_pts: int, metric: str = "l1_motor",
                  cf: int = 0):
    """Sequential reference-semantics DBSCAN.

    Args:
      pts: [N, 2] motor coords (l1_motor/signed_sum_xy) or [N, 3] xyz (l2_xyz).
      cf: starting cluster-id seed (reference DBImproved.cf, FrmMain.cs:1509).

    Returns:
      labels  i64[N]  cluster ids, 0 = noise
      n_clusters  int  number of clusters created (cf_final - cf_initial)
      is_core bool[N]
    """
    n = len(pts)
    labels = np.zeros(n, dtype=np.int64)
    classed = np.zeros(n, dtype=bool)
    is_core_flag = np.zeros(n, dtype=bool)
    if n == 0:
        return labels, 0, is_core_flag

    dist = pairwise_dist(pts, metric)
    neigh = dist <= eps  # note: includes self for l1/l2; signed metric may not

    def key_point_neighbors(i):
        idx = np.nonzero(neigh[i])[0]
        if len(idx) >= min_pts:
            is_core_flag[i] = True
        return list(idx)

    c = cf
    for i in range(n):
        if classed[i]:
            continue
        nei = key_point_neighbors(i)
        if len(nei) >= min_pts:
            c += 1
            # expandCluster(p=i, nei, c) per DBImproved.cs:56-89
            labels[i] = c
            in_nei = set(nei)
            k = 0
            while k < len(nei):
                j = nei[k]
                if not classed[j]:
                    classed[j] = True
                    tl = key_point_neighbors(j)
                    if len(tl) >= min_pts:
                        for t in tl:
                            if t not in in_nei:
                                in_nei.add(t)
                                nei.append(t)
                labels[j] = c
                k += 1
    return labels, c - cf, is_core_flag

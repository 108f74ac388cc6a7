"""High-level engine facade.

The orchestration role of the reference MainForm (SURVEY.md L7) as a
headless, scriptable API: one object that carries the config and walks the
full workflow -- import -> filter -> cluster -> reject -> coarse align ->
ICP -> match -> export. Every step delegates to the tested modules; this
layer only wires them and tracks workflow state.

Typical session (mirrors the reference menu flow, §3 call stacks):

    eng = Engine(EngineConfig())
    batch, names = eng.import_folder("scans/")
    batch = eng.filter_by_distance(batch, 2.0, 300.0)
    result = eng.cluster(batch)
    batch, result = eng.reject_by_radius(batch, result, radius=0.5)
    reg = eng.register_to_truth(result, truth_xyz)
    matches = eng.match(result, truth_xyz, reg)
    eng.export_scene("out/scene", batch, result, matches)
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .config import EngineConfig
from .data.convert import distance_window
from .data.pointbatch import PointBatch
from .io.ingest import import_scan_folder, import_scan_arrays
from .io import loaders
from .cluster.pipeline import cluster_scan, reject_clusters, ClusterResult
from .register.icp import icp, icp_multistart, ICPResult
from .register.coarse import auto_rescale_centers, rescale_region_truth
from .register.matching import assign_matches, registration_rmse
from .viz import vtkio


def _live_clusters(result: ClusterResult):
    """Valid centroid rows: nonempty AND not the noise row 0."""
    k = result.count.shape[0]
    return (result.count > 0) & (jnp.arange(k) > 0)


class Engine:
    def __init__(self, cfg: EngineConfig = EngineConfig()):
        self.cfg = cfg
        self.export_bit = 4  # decimal places for exports; import sniffs it

    # ---- ingestion (C2-C5) ----

    def import_folder(self, folder: str, pattern: str = "*.txt"):
        batch, names = import_scan_folder(folder, self.cfg.imports, pattern)
        # decimal-precision sniff on the first file drives export formatting
        # (FrmMain.cs:984 "浮点位数" bit)
        import glob as _glob
        import os as _os

        files = sorted(_glob.glob(_os.path.join(folder, pattern)))
        if files:
            self.export_bit = loaders.sniff_decimals(files[0])
        return batch, names

    def import_arrays(self, motor, rng, capacity: Optional[int] = None):
        return import_scan_arrays(motor, rng, self.cfg.imports, capacity)

    def filter_by_distance(self, batch: PointBatch, dis_min: float,
                           dis_max: float, path_id: Optional[int] = None
                           ) -> PointBatch:
        """Distance-window filter; confirm == the mask update itself
        (Tools.FilterByDistance_* + cleanDataByDistance semantics).

        path_id limits the window to one source file -- the reference's
        per-marker-file range gate (FrmMain.cs:1116-1130)."""
        keep = distance_window(batch.rng, dis_min, dis_max)
        if path_id is not None:
            keep = keep | (batch.path_id != path_id)
        return batch.with_valid(batch.valid & keep)

    def set_file_visibility(self, batch: PointBatch, visible) -> PointBatch:
        """Per-file show/hide -- the checkbox-tree analog
        (treeView1_AfterCheck, FrmMain.cs:2497-2609). ``visible`` is a bool
        array indexed by path_id."""
        visible = jnp.asarray(visible, bool)
        show = visible[jnp.clip(batch.path_id, 0, visible.shape[0] - 1)]
        return batch.with_valid(batch.valid & show)

    # ---- clustering (C6-C15) ----

    def cluster(self, batch: PointBatch, mode: str = "reference",
                centroid_merge: bool = False, quirks: bool = False,
                **caps) -> ClusterResult:
        """quirks=False (default): clean fusion semantics. quirks=True
        reproduces the reference's merge quirks bit-for-bit -- including its
        off-by-one total when the noise re-cluster recovers nothing
        (clusterSum-delSum-1 seed, FrmMain.cs:1509), a case where the
        reference itself would crash in GetClusList."""
        n = batch.capacity
        defaults = dict(
            max_blocks=max(64, n // max(self.cfg.cluster.pts_in_cell, 1)),
            max_clusters=1024,
            cluster_capacity=1024,
            noise_capacity=4096,
        )
        defaults.update(caps)
        return cluster_scan(batch.xyz, batch.motor, batch.valid, self.cfg,
                            mode=mode, quirks=quirks,
                            centroid_merge=centroid_merge,
                            backend=self.cfg.backend, **defaults)

    def cluster_grid(self, batch: PointBatch, cell_cap: int = 64,
                     max_clusters: int = 4096):
        """Tier-3 global path: grid-hash DBSCAN (no blocking) + centroids.
        Bit-compatible with plain reference DBSCAN over the whole scan."""
        from .cluster.grid import dbscan_grid, grid_metric
        from .ops.metrics import coords_for_metric
        from .ops.segment import cluster_stats

        metric = self.cfg.cluster.metric
        coords = coords_for_metric(batch.xyz, batch.motor, metric)
        gm = grid_metric(metric, coords.shape[-1])
        if gm is None:   # signed_sum_xy has no grid form; motor-L1 instead
            coords, gm = batch.motor, "l1_motor"
        out = dbscan_grid(coords, batch.valid, self.cfg.cluster.eps,
                          self.cfg.cluster.min_pts, gm, cell_cap=cell_cap)
        stats = cluster_stats(batch.xyz, batch.motor, out["label"],
                              batch.valid, max_clusters)
        return out, stats

    def cluster_sharded(self, batch: PointBatch, mesh=None,
                        halo_mode: str = "hier", block_capacity: int = None,
                        density: float = None, **kw):
        """Multi-device clustering (tier 5): Morton blocks shard over the
        mesh, per-device DBSCAN, noise re-cluster + hierarchical halo union
        (parallel.sharded.sharded_blocked_dbscan).

        ``density`` (points per unit metric-area), when given, sizes every
        capacity through ParallelConfig.size_caps so a sized run cannot
        silently drop points; otherwise pass explicit caps via **kw.
        Returns the sharded result dict with labels in BLOCK layout plus
        "point_index" [B, cap] mapping slots back to batch rows.
        """
        from .parallel.mesh import make_mesh
        from .parallel.sharded import sharded_blocked_dbscan
        from .cluster.blocks import (
            assign_blocks_balanced, gather_blocks_ordered,
        )
        from .ops.metrics import coords_for_metric
        from .config import ParallelConfig

        mesh = mesh if mesh is not None else make_mesh()
        ndev = mesh.devices.size
        cap = block_capacity or self.cfg.cluster.block_capacity
        coords = coords_for_metric(batch.xyz, batch.motor,
                                   self.cfg.cluster.metric)
        n = batch.capacity
        b = -(-n // cap)
        b += (-b) % ndev                      # blocks divisible by mesh
        part = assign_blocks_balanced(batch.motor, batch.valid, cap)
        bc, bv, pidx, _ = gather_blocks_ordered(
            coords, part["order"], batch.valid, b, cap)
        if density is not None:
            caps = ParallelConfig.size_caps(
                self.cfg.cluster.eps, density, cap,
                blocks_per_device=b // ndev, noise_frac=0.01)
            kw.setdefault("halo_cap", caps["halo_cap"])
            kw.setdefault("halo_cell_cap", caps["cell_cap"])
            kw.setdefault("noise_cell_cap", caps["cell_cap"])
            kw.setdefault("dev_halo_cap", caps["dev_halo_cap"])
            kw.setdefault("noise_capacity_per_device",
                          caps["noise_capacity"])
            kw.setdefault("noise_skin_cap", caps["noise_skin_cap"])
            kw.setdefault("noise_root_cap", caps["noise_root_cap"])
        out = sharded_blocked_dbscan(
            mesh, bc, bv, eps=self.cfg.cluster.eps,
            min_pts=self.cfg.cluster.min_pts,
            metric=self.cfg.cluster.metric,
            min_cluster_size=self.cfg.cluster.min_cluster_size,
            halo_merge=True, halo_mode=halo_mode,
            backend=self.cfg.backend, **kw)
        out["point_index"] = pidx
        return out

    def reject_by_radius(self, batch: PointBatch, result: ClusterResult,
                         radius: Optional[float] = None,
                         aspect: Optional[float] = None):
        new_valid, rejected = reject_clusters(
            result, batch.valid,
            self.cfg.filters.radius_threshold if radius is None else radius,
            self.cfg.filters.aspect_threshold if aspect is None else aspect,
        )
        return batch.with_valid(new_valid), rejected

    # ---- registration (C18-C22) ----

    def coarse_align(self, result: ClusterResult, truth_xyz,
                     region_mask=None):
        """Extent auto-rescale of centroids to truth; optional region-subset
        truth rescale. Returns (centers_tmp [K,3], truth_tmp [M,3])."""
        cvalid = _live_clusters(result)
        truth_xyz = jnp.asarray(truth_xyz)
        tvalid = jnp.ones(truth_xyz.shape[0], bool)
        tmp_xy, scale, bounds = auto_rescale_centers(
            result.center3d[:, :2], cvalid, truth_xyz[:, :2], tvalid)
        centers_tmp = jnp.concatenate(
            [tmp_xy, jnp.zeros_like(tmp_xy[:, :1])], axis=-1)
        if region_mask is not None:
            t_xy = rescale_region_truth(truth_xyz[:, :2],
                                        jnp.asarray(region_mask), bounds)
        else:
            t_xy = truth_xyz[:, :2]
        truth_tmp = jnp.concatenate(
            [t_xy, jnp.zeros_like(t_xy[:, :1])], axis=-1)
        return centers_tmp, truth_tmp

    def register_to_truth(self, result: ClusterResult, truth_xyz,
                          coarse: bool = True,
                          region_mask=None) -> ICPResult:
        cvalid = _live_clusters(result)
        truth_xyz = jnp.asarray(truth_xyz)
        if coarse:
            src, tgt = self.coarse_align(result, truth_xyz, region_mask)
            tvalid = (jnp.ones(truth_xyz.shape[0], bool)
                      if region_mask is None else jnp.asarray(region_mask))
        else:
            src, tgt = result.center3d, truth_xyz
            tvalid = jnp.ones(truth_xyz.shape[0], bool)
        if self.cfg.icp.ransac_iters > 0:
            from .register.icp import icp_ransac

            return icp_ransac(src, cvalid, tgt, tvalid, self.cfg.icp)
        if self.cfg.icp.num_starts > 1:
            return icp_multistart(src, cvalid, tgt, tvalid, self.cfg.icp)
        return icp(src, cvalid, tgt, tvalid, self.cfg.icp)

    def match(self, result: ClusterResult, truth_xyz, reg: ICPResult,
              coarse: bool = True, match_distance: Optional[float] = None):
        truth_xyz = jnp.asarray(truth_xyz)
        cvalid = _live_clusters(result)
        if coarse:
            src, tgt = self.coarse_align(result, truth_xyz)
        else:
            src, tgt = result.center3d, truth_xyz
        out = assign_matches(
            src, cvalid, tgt, jnp.ones(truth_xyz.shape[0], bool),
            reg.r, reg.t,
            self.cfg.icp.match_distance if match_distance is None
            else match_distance,
        )
        out["rmse"] = registration_rmse(out, tgt)
        return out

    # ---- export / viz (C25, Tools export) ----

    def export_scene(self, prefix: str, batch: PointBatch,
                     result: ClusterResult, matches=None, truth_tmp=None):
        data = batch.to_numpy()
        lab = np.asarray(result.label)[np.asarray(batch.valid)]
        vtkio.write_points_vtk(prefix + "_points.vtk", data["xyz"], lab)
        vtkio.write_circles_vtk(
            prefix + "_circles.vtk",
            np.asarray(result.center3d)[:, :2], np.asarray(result.radius3d))
        if matches is not None and truth_tmp is not None:
            m = np.asarray(matches["is_matched"])
            starts = np.asarray(matches["matched_xyz"])[m]
            ends = np.asarray(truth_tmp)[np.asarray(matches["match_idx"])[m]]
            vtkio.write_lines_vtk(prefix + "_matches.vtk", starts, ends)

    def screenshot(self, path: str, batch: PointBatch,
                   result: Optional[ClusterResult] = None,
                   view: str = "xy", width: int = 800, height: int = 600,
                   point_size: int = 1):
        """Headless scene snapshot to PNG + legend sidecar: the Tools.Screen
        capture (Tools.cs:32-54), Show2DPoints motor view
        (FrmMain.cs:542-674), and legend panel (:1981-2102) analogs in one
        call. view: "xy" Cartesian or "motor" 2D motor space."""
        from .viz.snapshot import snapshot_clusters

        labels = (np.asarray(result.label) if result is not None
                  else np.zeros(batch.capacity, np.int32))
        counts = np.asarray(result.count) if result is not None else None
        return snapshot_clusters(
            path, xyz=np.asarray(batch.xyz), motor=np.asarray(batch.motor),
            labels=labels, valid=np.asarray(batch.valid), view=view,
            width=width, height=height, point_size=point_size,
            counts=counts)

    def export_centroids(self, path: str, result: ClusterResult,
                         bit: Optional[int] = None):
        live = np.asarray(_live_clusters(result))
        loaders.export_centroids(path, np.asarray(result.center3d)[live],
                                 bit if bit is not None else self.export_bit)

    def export_cluster_points(self, path: str, batch: PointBatch,
                              result: ClusterResult,
                              bit: Optional[int] = None,
                              path_id: Optional[int] = None):
        """Cluster-point export; path_id restricts to one source file
        (per-file export through the visibility tree, FrmMain.cs:2497-2609)."""
        v = np.asarray(batch.valid)
        if path_id is not None:
            v = v & (np.asarray(batch.path_id) == path_id)
        loaders.export_cluster_points(
            path, np.asarray(result.label)[v], np.asarray(batch.motor)[v],
            np.asarray(batch.rng)[v],
            bit if bit is not None else self.export_bit)

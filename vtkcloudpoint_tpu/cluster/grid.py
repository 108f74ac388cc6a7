"""Grid-hash DBSCAN: global clustering without block partitioning.

BASELINE.json tier-3 path (5M-pt scan, grid-hash neighbor kernels): instead
of the reference's block decomposition + fusion, bin points into eps-sized
cells and restrict every neighborhood scan to the 3x3 surrounding cells --
the TPU replacement for the VTK point locator (SURVEY.md "Native components"
item 3).

Design (static shapes throughout):
- points sort by cell id; each point's 9 neighbor cells resolve to start
  offsets with searchsorted; candidates are a fixed window of ``cell_cap``
  slots per neighbor cell, masked by cell-id equality. Points beyond
  cell_cap in an overfull cell still act as queries but stop being visible
  as candidates -- counted in ``overflow`` so callers can re-run with a
  bigger cap.
- core test, min-label propagation (original-index labels, so cluster ids
  keep the reference's scan-order semantics) with pointer jumping, then the
  same deterministic renumbering + max-id border rule as cluster.dbscan.

Only the L1-motor metric is supported (its eps-ball fits the 3x3 eps-cell
stencil); l2 over 2D also fits and is allowed.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
            (1, -1), (1, 0), (1, 1)]


def _pair_dist(a, b, metric):
    if metric == "l1_motor":
        return jnp.sum(jnp.abs(a - b), axis=-1)
    if metric == "l2_xy":
        return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1))
    raise ValueError(f"grid mode does not support metric {metric!r}")


@partial(
    jax.jit,
    static_argnames=("eps", "min_pts", "metric", "cell_cap", "max_iters"),
)
def dbscan_grid(
    coords,
    valid,
    eps: float,
    min_pts: int,
    metric: str = "l1_motor",
    cf=0,
    cell_cap: int = 32,
    max_iters: int = 64,
):
    """Grid-hash DBSCAN over one (large) point set.

    coords: [N, 2]; valid: [N]. Returns dict(label, n_clusters, core,
    overflow) with the same id semantics as cluster.dbscan.dbscan_padded.
    """
    n = coords.shape[0]
    x = coords[:, 0]
    y = coords[:, 1]
    big = jnp.asarray(1e30, coords.dtype)
    xmin = jnp.min(jnp.where(valid, x, big))
    ymin = jnp.min(jnp.where(valid, y, big))
    # int32 cell ids (TPU has no x64); (ncx+2)*(ncy+2) must stay < 2^31-1,
    # i.e. the scan extent may span up to ~46k x 46k eps-cells
    cx = jnp.floor((x - xmin) / eps).astype(jnp.int32)
    cy = jnp.floor((y - ymin) / eps).astype(jnp.int32)
    ymax = jnp.max(jnp.where(valid, y, -big))
    ncy = (jnp.floor((ymax - ymin) / eps)).astype(jnp.int32) + 3
    # +1 so neighbor offsets never go negative / collide across rows
    cell = (cx + 1) * ncy + (cy + 1)
    int_max = jnp.int32(2**31 - 1)
    cell = jnp.where(valid, cell, int_max)

    order = jnp.argsort(cell, stable=True)          # sorted position -> orig
    sc = cell[order]                                # sorted cell ids
    pts_s = coords[order]
    valid_s = valid[order]

    # start offset of each point's 9 neighbor cells
    own = sc
    nbr_cells = jnp.stack(
        [own + (dx * ncy + dy) for dx, dy in _OFFSETS], axis=1
    )  # [N, 9]
    starts = jnp.searchsorted(sc, nbr_cells.reshape(-1)).reshape(n, 9)

    k_idx = jnp.arange(cell_cap)
    my_orig = order

    def candidate_block(p_slice):
        """For sorted positions p in a chunk: candidate sorted indices
        [c, 9*cap] + validity mask."""
        st = starts[p_slice]                          # [c, 9]
        raw = st[:, :, None] + k_idx[None, None, :]   # [c, 9, cap]
        in_range = raw < n  # must mask BEFORE clamping: a clamped index
        cand = jnp.minimum(raw, n - 1)  # could alias the last point
        want = nbr_cells[p_slice][:, :, None]
        ok = (sc[cand] == want) & valid_s[cand] & in_range
        return cand.reshape(p_slice.shape[0], -1), ok.reshape(
            p_slice.shape[0], -1
        )

    chunk = 8192 if n > 8192 else n
    pad = (-n) % chunk
    pos = jnp.arange(n + pad) % jnp.maximum(n, 1)

    def counts_chunk(p_slice):
        cand, ok = candidate_block(p_slice)
        d = _pair_dist(pts_s[p_slice][:, None, :], pts_s[cand], metric)
        hit = ok & (d <= eps)
        return jnp.sum(hit, axis=1, dtype=jnp.int32)

    counts_s = jax.lax.map(
        counts_chunk, pos.reshape(-1, chunk)
    ).reshape(-1)[:n]
    core_s = (counts_s >= min_pts) & valid_s

    # overflow accounting: rank within own cell >= cap
    own_start = starts[:, 4]  # offset (0,0) is index 4 in _OFFSETS
    rank = jnp.arange(n) - own_start
    overflow = jnp.sum((rank >= cell_cap) & valid_s, dtype=jnp.int32)

    # ---- min-label propagation in ORIGINAL index space ----
    core_orig = jnp.zeros(n, bool).at[my_orig].set(core_s)
    idx = jnp.arange(n, dtype=jnp.int32)
    inf = jnp.int32(n)
    lab0 = jnp.where(core_orig, idx, inf)

    def sweep(lab):
        def chunk_min(p_slice):
            cand, ok = candidate_block(p_slice)
            d = _pair_dist(pts_s[p_slice][:, None, :], pts_s[cand], metric)
            adj = ok & (d <= eps) & core_s[cand]
            cand_lab = lab[my_orig[cand]]
            nl = jnp.min(jnp.where(adj, cand_lab, inf), axis=1)
            return nl

        nl_s = jax.lax.map(
            chunk_min, pos.reshape(-1, chunk)
        ).reshape(-1)[:n]
        nl = jnp.full(n, inf, jnp.int32).at[my_orig].set(nl_s)
        new = jnp.where(core_orig, jnp.minimum(lab, nl), inf)
        jumped = new[jnp.clip(new, 0, n - 1)]
        return jnp.where(new < inf, jnp.minimum(new, jumped), inf)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lab1 = sweep(lab0)
    lab, _, _ = jax.lax.while_loop(
        cond, body, (lab1, jnp.any(lab1 != lab0), jnp.int32(1))
    )

    # ---- renumber + border (same rules as dbscan_padded) ----
    is_root = core_orig & (lab == idx)
    rank_root = jnp.cumsum(is_root.astype(jnp.int32))
    core_id = jnp.where(core_orig, cf + rank_root[jnp.clip(lab, 0, n - 1)], 0)

    core_id_s = core_id[my_orig]

    def border_chunk(p_slice):
        cand, ok = candidate_block(p_slice)
        d = _pair_dist(pts_s[p_slice][:, None, :], pts_s[cand], metric)
        adj = ok & (d <= eps) & core_s[cand]
        return jnp.max(jnp.where(adj, core_id_s[cand], 0), axis=1)

    border_s = jax.lax.map(
        border_chunk, pos.reshape(-1, chunk)
    ).reshape(-1)[:n]
    border = jnp.zeros(n, jnp.int32).at[my_orig].set(border_s)

    label = jnp.where(
        core_orig, core_id, jnp.where(valid, border, 0)
    ).astype(jnp.int32)
    return {
        "label": label,
        "n_clusters": jnp.sum(is_root.astype(jnp.int32)),
        "core": core_orig,
        "overflow": overflow,
    }

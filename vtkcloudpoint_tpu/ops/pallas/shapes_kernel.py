"""Pallas TPU kernel: fused per-cluster-GROUP shape analytics in VMEM.

One grid step = a group of G clusters: the [G, cap] coordinate rows load
once, then gift-wrap hull, minimal-enclosing-circle candidate scan, and
min-area rectangle all run batched over the group on VMEM-resident data.

Two layout lessons bought with probes (probe_shapes_r05, v5e):
- the XLA pipeline vectorizes across clusters but re-reads the [K, cap]
  arrays from HBM on every one of the hull sweep's ~max_hull dependent
  steps (hull alone 6.4 of 10.6 ms);
- a one-cluster-per-step kernel keeps data resident but strands the VPU
  on [1, cap] rows (one sublane live) and serializes 2048 hull loops:
  measured 21 ms -- WORSE than XLA. Clusters must ride the SUBLANES:
  with G rows per op, the same hull loop costs G x fewer iterations
  total and every op runs full tiles. This kernel: 2.1 ms.

Same semantics as ops.geometry.cluster_shapes(hull="wrap", mec="scan"),
bit-equal radii (max_rel_radius_diff 0.0 on-chip):
- hull: reference pseudo-angle gift wrap (Geometry.cs:122-246), argmin
  tie-breaks realized as min + first-index-of-min;
- MEC: brute force over hull pairs + the C(max_hull,3) triples with
  defining-point-skipped containment (Geometry.cs:247-337). Pairs and
  triples enter as constant one-hot tables [max_hull, P|T]; hull coords
  gather onto candidate lanes with [G,h] @ [h,T] matmuls at
  Precision.HIGHEST (the MXU default truncates f32 coords to bf16);
- rect: per-edge projection sweep (Polygon.cs:360-702).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as _np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbor import _on_tpu

BIG = 1e30


def _fiota(shape, dim):
    """f32 iota via int32 (tpu.iota only produces integer vectors)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32)


def _row_argmin(vals, limit):
    """Per-row (min, first index of min) over [G, n] lanes."""
    m = jnp.min(vals, axis=1, keepdims=True)
    iota = _fiota(vals.shape, 1)
    idx = jnp.min(jnp.where(vals == m, iota, jnp.float32(limit)),
                  axis=1, keepdims=True)
    return m, idx


def _row_extract(rows, idx_col):
    """rows[g, idx[g]] -> [G, 1] via one-hot reduce."""
    iota = _fiota(rows.shape, 1)
    return jnp.sum(jnp.where(iota == idx_col, rows, 0.0), axis=1,
                   keepdims=True)


def _pseudo_angle(x1, y1, x2, y2):
    """ops.geometry.pseudo_angle, same arithmetic (Geometry.cs:210-246)."""
    dx = x2 - x1
    dy = y2 - y1
    denom = jnp.abs(dx) + jnp.abs(dy)
    tq = jnp.where(denom == 0, 360.0 / 9.0,
                   dy / jnp.where(denom == 0, 1.0, denom))
    tq = jnp.where(denom == 0, tq,
                   jnp.where(dx < 0, 2.0 - tq,
                             jnp.where(dy < 0, 4.0 + tq, tq)))
    return tq * 90.0


def _gat(rows, oh_ref, exact):
    """[G, h] hull rows -> [G, T] candidate lanes through a one-hot."""
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    return jnp.dot(rows, oh_ref[...], preferred_element_type=jnp.float32,
                   precision=prec)


def _shapes_kernel(coords_ref, valid_ref, oh_a_ref, oh_b_ref, oh_c_ref,
                   oh_pi_ref, oh_pj_ref, out_ref, *, g, cap, h, t_len,
                   p_len):
    x = coords_ref[0, 0]                            # [G, cap]
    y = coords_ref[0, 1]
    v = valid_ref[0, 0]                             # [G, cap] f32 0/1
    vb = v > 0.0
    iota_cap = _fiota((g, cap), 1)
    any_valid = jnp.any(vb, axis=1, keepdims=True)  # [G, 1]

    # ---- gift-wrap hull (geometry.convex_hull semantics) ----
    ymin = jnp.min(jnp.where(vb, y, BIG), axis=1, keepdims=True)
    cand = vb & (y == ymin)
    _, start = _row_argmin(jnp.where(cand, x, BIG), cap)
    x_start = _row_extract(x, start)                # [G, 1]
    y_start = _row_extract(y, start)

    hull_iota = _fiota((g, h), 1)
    hx0 = jnp.where(hull_iota == 0, x_start, 0.0)   # [G, h]
    hy0 = jnp.where(hull_iota == 0, y_start, 0.0)
    hv0 = jnp.where((hull_iota == 0) & any_valid, 1.0, 0.0)

    def step(state):
        # ``done`` carried as f32 0/1: [G,1] i1 while-carries hit a Mosaic
        # scf.yield layout-legalization failure (replicated-lane vs
        # concrete layouts); the f32 relayout path works
        cur_x, cur_y, sweep, picked, done, hx, hy, hv, i = state
        ang = _pseudo_angle(cur_x, cur_y, x, y)     # [G, cap]
        ok = vb & (picked == 0.0) & (ang >= sweep)
        best_angle, best = _row_argmin(jnp.where(ok, ang, BIG), cap)
        first_angle = _pseudo_angle(cur_x, cur_y, x_start, y_start)
        finish = ((first_angle >= sweep) & (best_angle >= first_angle)
                  ) | (best_angle >= BIG)
        new_done = jnp.maximum(done, jnp.where(finish, 1.0, 0.0))
        emit = new_done == 0.0                      # [G, 1] bool (local)
        bx = _row_extract(x, best)
        by = _row_extract(y, best)
        cur_x = jnp.where(emit, bx, cur_x)
        cur_y = jnp.where(emit, by, cur_y)
        sweep = jnp.where(emit, best_angle, sweep)
        picked = jnp.where((iota_cap == best) & emit, 1.0, picked)
        slot = (hull_iota == (i + 1).astype(jnp.float32)) & emit
        hx = jnp.where(slot, bx, hx)
        hy = jnp.where(slot, by, hy)
        hv = jnp.where(slot, 1.0, hv)
        return cur_x, cur_y, sweep, picked, new_done, hx, hy, hv, i + 1

    picked0 = jnp.where(iota_cap == start, 1.0, 0.0)
    zero_col = jnp.zeros((g, 1), jnp.float32)
    done0 = jnp.where(any_valid, 0.0, 1.0)
    st = (x_start, y_start, zero_col, picked0, done0,
          hx0, hy0, hv0, jnp.int32(0))
    *_, hx, hy, hv, _ = jax.lax.while_loop(
        lambda s: jnp.any(s[4] == 0.0) & (s[8] < h - 1), step, st)

    # masked hull coordinate rows (geometry's px/py: invalid -> BIG)
    hxm = jnp.where(hv > 0, hx, BIG)                # [G, h]
    hym = jnp.where(hv > 0, hy, BIG)

    # ---- MEC: pair + triple candidates through one-hot tables ----
    def circles_pairs():
        ax = _gat(hxm, oh_pi_ref, True)             # [G, P]
        ay = _gat(hym, oh_pi_ref, True)
        bx = _gat(hxm, oh_pj_ref, True)
        by = _gat(hym, oh_pj_ref, True)
        av = _gat(hv, oh_pi_ref, False)
        bv = _gat(hv, oh_pj_ref, False)
        cx = (ax + bx) / 2
        cy = (ay + by) / 2
        r2 = (cx - ax) ** 2 + (cy - ay) ** 2
        ok = (av > 0) & (bv > 0)
        skip = oh_pi_ref[...] + oh_pj_ref[...]      # [h, P]
        return cx, cy, r2, ok, skip

    def circles_triples():
        ax = _gat(hxm, oh_a_ref, True)              # [G, T]
        ay = _gat(hym, oh_a_ref, True)
        bx = _gat(hxm, oh_b_ref, True)
        by = _gat(hym, oh_b_ref, True)
        cx_ = _gat(hxm, oh_c_ref, True)
        cy_ = _gat(hym, oh_c_ref, True)
        av = _gat(hv, oh_a_ref, False)
        bv = _gat(hv, oh_b_ref, False)
        cv = _gat(hv, oh_c_ref, False)
        x1 = (bx + ax) / 2
        y1 = (by + ay) / 2
        dy1 = bx - ax
        dx1 = -(by - ay)
        x2 = (cx_ + bx) / 2
        y2 = (cy_ + by) / 2
        dy2 = cx_ - bx
        dx2 = -(cy_ - by)
        denom = dy1 * dx2 - dx1 * dy2
        t1 = ((x1 - x2) * dy2 + (y2 - y1) * dx2) / denom
        ccx = x1 + dx1 * t1
        ccy = y1 + dy1 * t1
        r2 = (ccx - ax) ** 2 + (ccy - ay) ** 2
        r2 = jnp.where(jnp.isfinite(r2), r2, BIG)
        ok = (av > 0) & (bv > 0) & (cv > 0)
        skip = oh_a_ref[...] + oh_b_ref[...] + oh_c_ref[...]
        return ccx, ccy, r2, ok, skip

    def contain(ccx, ccy, r2, ok, skip, limit):
        """(best r2, center) after containment over the hull points.

        skip[k, t] = 1 where hull slot k defines candidate t
        (CircleEnclosesPoints skip1/2/3, Geometry.cs:322-337)."""
        enc = jnp.ones(ccx.shape, jnp.float32)
        for k in range(h):
            hxk = hxm[:, k:k + 1]                   # [G, 1]
            hyk = hym[:, k:k + 1]
            hvk = hv[:, k:k + 1]
            d2 = (ccx - hxk) ** 2 + (ccy - hyk) ** 2
            ins = (d2 <= r2) | (skip[k:k + 1, :] > 0) | (hvk <= 0)
            enc = enc * jnp.where(ins, 1.0, 0.0)
        r2m = jnp.where((enc > 0) & ok, r2, BIG)
        best, idx = _row_argmin(r2m, limit)
        return best, _row_extract(ccx, idx), _row_extract(ccy, idx)

    pcx, pcy, pr2, pok, pskip = circles_pairs()
    best_pair, bp_cx, bp_cy = contain(pcx, pcy, pr2, pok, pskip, p_len)
    tcx, tcy, tr2, tok, tskip = circles_triples()
    best_trip, bt_cx, bt_cy = contain(tcx, tcy, tr2, tok, tskip, t_len)

    use_t = best_trip < best_pair
    best_r2 = jnp.where(use_t, best_trip, best_pair)
    mcx = jnp.where(use_t, bt_cx, bp_cx)
    mcy = jnp.where(use_t, bt_cy, bp_cy)
    none = best_r2 >= BIG
    radius = jnp.where(none, 0.0, jnp.sqrt(jnp.maximum(best_r2, 0.0)))
    mcx = jnp.where(none, hx[:, 0:1], mcx)
    mcy = jnp.where(none, hy[:, 0:1], mcy)

    # ---- min-area rectangle (geometry.min_area_rect semantics) ----
    n_hull = jnp.sum(hv, axis=1, keepdims=True)     # [G, 1]
    last = jnp.maximum(n_hull - 1.0, 0.0)
    nxt = jnp.where(hull_iota == last, 0.0,
                    jnp.minimum(hull_iota + 1.0, last))     # [G, h]
    nx = jnp.zeros((g, h), jnp.float32)
    ny = jnp.zeros((g, h), jnp.float32)
    for k in range(h):
        sel = nxt == k
        nx = jnp.where(sel, hx[:, k:k + 1], nx)
        ny = jnp.where(sel, hy[:, k:k + 1], ny)
    ex = nx - hx
    ey = ny - hy
    elen = jnp.sqrt(ex * ex + ey * ey)
    edge_ok = (hv > 0) & (elen > 0)
    ux = ex / jnp.maximum(elen, 1e-30)
    uy = ey / jnp.maximum(elen, 1e-30)
    max_u = jnp.full((g, h), -BIG, jnp.float32)
    min_u = jnp.full((g, h), BIG, jnp.float32)
    max_v = jnp.full((g, h), -BIG, jnp.float32)
    min_v = jnp.full((g, h), BIG, jnp.float32)
    for k in range(h):
        hxk = hx[:, k:k + 1]
        hyk = hy[:, k:k + 1]
        hvk = hv[:, k:k + 1] > 0
        pu = hxk * ux + hyk * uy
        pv = hxk * (-uy) + hyk * ux
        max_u = jnp.where(hvk, jnp.maximum(max_u, pu), max_u)
        min_u = jnp.where(hvk, jnp.minimum(min_u, pu), min_u)
        max_v = jnp.where(hvk, jnp.maximum(max_v, pv), max_v)
        min_v = jnp.where(hvk, jnp.minimum(min_v, pv), min_v)
    ext_u = max_u - min_u
    ext_v = max_v - min_v
    area = jnp.where(edge_ok, ext_u * ext_v, BIG)
    _, eidx = _row_argmin(area, h)
    l0 = _row_extract(ext_u, eidx)
    l1 = _row_extract(ext_v, eidx)
    a_best = _row_extract(area, eidx)
    rect_ok = a_best < BIG
    len_long = jnp.where(rect_ok, jnp.maximum(l0, l1), 0.0)
    len_short = jnp.where(rect_ok, jnp.minimum(l0, l1), 0.0)
    a_out = jnp.where(rect_ok, a_best, 0.0)

    out_iota = _fiota((g, 8), 1)
    out = jnp.zeros((g, 8), jnp.float32)
    for slot_i, val in enumerate(
            (mcx, mcy, radius, len_long, len_short, a_out, n_hull)):
        out = jnp.where(out_iota == slot_i,
                        val.astype(jnp.float32), out)
    out_ref[0] = out


@functools.partial(jax.jit,
                   static_argnames=("max_hull", "min_points", "group"))
def cluster_shapes_pallas(points, valid, counts, max_hull: int = 32,
                          min_points: int = 4, group: int = 32):
    """Fused VMEM shapes: drop-in for ops.geometry.cluster_shapes
    (hull="wrap", mec="scan") -- same dict keys, same semantics, radii
    bit-equal on-chip; 2.1 vs 10.6 ms at the bench shape
    (probe_shapes_r05).

    points: [K, cap, 2] f32; valid: [K, cap]; counts: [K].
    """
    from ..geometry import _triple_table

    K, cap, _ = points.shape
    h = max_hull
    # VMEM budget: the hull loop keeps ~10 [G, cap] f32 arrays live plus
    # the one-hot tables; G x cap <= 2^17 keeps the 16 MB limit with
    # headroom (G=32 at the cap=1024 bench shape; halves per cap doubling
    # -- cap=8192 at G=32 measured 17.5 MB and OOM'd scoped vmem)
    g = max(8, min(group, 2**17 // cap, K))

    tri = _triple_table(h)
    t_len = tri.shape[0]
    # padding repeats the last entry: identical candidates can never beat
    # an earlier equal minimum under the strict first-min tie-breaks
    tri = _np.concatenate(
        [tri, _np.repeat(tri[-1:], (-t_len) % 128, axis=0)])
    # pairs (i < j) in row-major order -- same tie-break order as the XLA
    # path's argmin over the flattened [h, h] pair table
    pi, pj = _np.triu_indices(h, k=1)
    p_len = len(pi)
    ppad = (-p_len) % 128
    pi = _np.concatenate([pi, _np.repeat(pi[-1:], ppad)])
    pj = _np.concatenate([pj, _np.repeat(pj[-1:], ppad)])

    eye = _np.eye(h, dtype=_np.float32)
    oh_a = jnp.asarray(eye[:, tri[:, 0]])
    oh_b = jnp.asarray(eye[:, tri[:, 1]])
    oh_c = jnp.asarray(eye[:, tri[:, 2]])
    oh_pi = jnp.asarray(eye[:, pi])
    oh_pj = jnp.asarray(eye[:, pj])
    T = oh_a.shape[1]
    P = oh_pi.shape[1]

    kpad = (-K) % g
    pts = jnp.pad(points.astype(jnp.float32), ((0, kpad), (0, 0), (0, 0)))
    vf = jnp.pad(valid, ((0, kpad), (0, 0))).astype(jnp.float32)
    kp = pts.shape[0]
    # [ngroups, 2, G, cap] coordinate planes / [ngroups, 1, G, cap] valid
    soa = jnp.swapaxes(pts, 1, 2).reshape(kp // g, g, 2, cap)
    soa = jnp.swapaxes(soa, 1, 2)
    vfg = vf.reshape(kp // g, 1, g, cap)

    out = pl.pallas_call(
        functools.partial(_shapes_kernel, g=g, cap=cap, h=h,
                          t_len=t_len, p_len=p_len),
        grid=(kp // g,),
        in_specs=[
            pl.BlockSpec((1, 2, g, cap), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, cap), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, T), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, T), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, T), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, P), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, P), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, 8), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp // g, g, 8), jnp.float32),
        interpret=not _on_tpu(),
    )(soa, vfg, oh_a, oh_b, oh_c, oh_pi, oh_pj)

    o = out.reshape(kp, 8)[:K]
    r = o[:, 2]
    l0 = o[:, 3]
    l1 = o[:, 4]
    area = o[:, 5]
    skip = counts < min_points
    zero = jnp.zeros_like(r)
    return {
        "prune_overflow": jnp.int32(0),
        "center_x": o[:, 0],
        "center_y": o[:, 1],
        "radius": jnp.where(skip, zero, r),
        "rect_len0": jnp.where(skip, zero, l0),
        "rect_len1": jnp.where(skip, zero, l1),
        "rect_area": jnp.where(skip, zero, area),
        "aspect": jnp.where(
            skip | (l1 <= 0), zero, l0 / jnp.maximum(l1, 1e-30)
        ),
    }

"""SE(3) utilities: Horn quaternion / Kabsch SVD closed-form rigid alignment.

TPU-native replacement for the reference's registration solvers:
- production path: vtkLandmarkTransform rigid-body SVD solve inside
  vtkIterativeClosestPointTransform (FrmMain.cs:851-862)
- managed path: Horn quaternion via 4x4 Jacobi eigensolve (ICP.cs:18-181)

The managed reference has three transcribed bugs (SURVEY.md C18): it ADDS the
mean outer product where Horn subtracts (ICP.cs:65-66), uses delta[2]=A[0,0]
instead of A[0,1] (ICP.cs:74-76), and mis-indexes rotation accumulation
(ICP.cs:170-174). This module implements the CORRECT Horn/Kabsch math; parity
is validated against rigid-transform recovery and the VTK-style behavior, per
SURVEY.md §7 L5.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rot(q):
    """Unit quaternion (w, x, y, z) -> 3x3 rotation (ICP.cs:274-285 layout)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
        ]
    )


def horn_solve(p, y, weights=None):
    """Closed-form rigid alignment: find (R, t) minimizing sum w ||R p + t - y||^2.

    p, y: [N, 3] corresponding point sets; weights: optional [N] (0 masks a
    pair out). Horn's quaternion method: max-eigenvector of the 4x4 N-matrix
    built from the weighted cross-covariance.
    """
    if weights is None:
        weights = jnp.ones(p.shape[0], p.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-30)
    wn = (weights / wsum)[:, None]
    mean_p = jnp.sum(p * wn, axis=0)
    mean_y = jnp.sum(y * wn, axis=0)
    pc = p - mean_p
    yc = y - mean_y
    # cross-covariance M = sum w (p - mp)(y - my)^T  (correct Horn: the mean
    # term is SUBTRACTED, unlike reference ICP.cs:65-66)
    m = (pc * wn).T @ yc
    a = m - m.T
    delta = jnp.array([a[1, 2], a[2, 0], a[0, 1]])  # correct A[0,1] (vs ICP.cs:76)
    tr = jnp.trace(m)
    q_mat = jnp.zeros((4, 4), p.dtype)
    q_mat = q_mat.at[0, 0].set(tr)
    q_mat = q_mat.at[0, 1:].set(delta)
    q_mat = q_mat.at[1:, 0].set(delta)
    q_mat = q_mat.at[1:, 1:].set(m + m.T - tr * jnp.eye(3, dtype=p.dtype))
    evals, evecs = jnp.linalg.eigh(q_mat)
    q = evecs[:, jnp.argmax(evals)]
    r = quat_to_rot(q)
    t = mean_y - r @ mean_p
    return r, t


def kabsch_solve(p, y, weights=None):
    """Rigid alignment via SVD (Kabsch/Umeyama) -- the vtkLandmarkTransform
    RigidBody mode equivalent (vtkLandmarkTransform.h:34-63)."""
    if weights is None:
        weights = jnp.ones(p.shape[0], p.dtype)
    wsum = jnp.maximum(jnp.sum(weights), 1e-30)
    wn = (weights / wsum)[:, None]
    mean_p = jnp.sum(p * wn, axis=0)
    mean_y = jnp.sum(y * wn, axis=0)
    h = ((p - mean_p) * wn).T @ (y - mean_y)
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    s = jnp.diag(jnp.array([1.0, 1.0, d], p.dtype))
    r = vt.T @ s @ u.T
    t = mean_y - r @ mean_p
    return r, t


def apply_rigid(r, t, pts):
    """x -> R x + t for [N,3] points."""
    return pts @ r.T + t


def compose(r1, t1, r0, t0):
    """(r1,t1) o (r0,t0): apply (r0,t0) first."""
    return r1 @ r0, r1 @ t0 + t1


def to_matrix4(r, t):
    """4x4 homogeneous matrix (vtk icp.GetMatrix() layout, FrmMain.cs:862)."""
    m = jnp.eye(4, dtype=r.dtype)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


def rotz(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def random_rotation(key):
    """Uniform random rotation from a random unit quaternion."""
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    return quat_to_rot(q)

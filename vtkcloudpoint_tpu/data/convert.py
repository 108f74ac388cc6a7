"""Motor-angle <-> Cartesian coordinate conversion.

Forward conversion reproduces reference FrmMain.cs:1025-1062 exactly:

    pitch   = -2 * (motor_x - x_angle) * pi / 180
    azimuth =  2 * (motor_y - y_angle) * pi / 180
    tmpx = D * cos(pitch) * sin(azimuth)
    tmpy = D * sin(pitch) * cos(azimuth)
    z    = D * cos(pitch)
    X, Y picked from {tmpy, tmpx, -tmpy, -tmpx} via xdir/ydir 4-way switches.

Inverse conversion reproduces reference Tools.cs:335-339 / FrmMain.cs:1693-1694:

    phi  = asin(y / z);  xita = atan(x / (z * cos(phi)))
    motor_x = xita * (-90) / pi + x_angle
    motor_y = phi * 90 / pi + y_angle
    d = z / cos(xita)

Range gate per FrmMain.cs:1011: drop Distance == 0 or Distance > 1000.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import ImportConfig

_DIR_SIGN = {1: 1.0, 2: 1.0, 3: -1.0, 4: -1.0}
_DIR_PICKS_TMPY = {1: True, 2: False, 3: True, 4: False}


def motor_to_xyz(motor, rng, cfg: ImportConfig = ImportConfig()):
    """Spherical (motor_x, motor_y, Distance) -> Cartesian xyz [N,3].

    ``xdir``/``ydir`` are static Python ints (axis remap is a fixed scan rig
    property, not data), so the switch resolves at trace time.
    """
    mx = motor[..., 0]
    my = motor[..., 1]
    pitch = (-2.0) * (mx - cfg.x_angle) / 180.0 * jnp.pi
    az = 2.0 * (my - cfg.y_angle) / 180.0 * jnp.pi
    tmpx = rng * jnp.cos(pitch) * jnp.sin(az)
    tmpy = rng * jnp.sin(pitch) * jnp.cos(az)
    z = rng * jnp.cos(pitch)

    def pick(d):
        base = tmpy if _DIR_PICKS_TMPY[d] else tmpx
        return _DIR_SIGN[d] * base

    return jnp.stack([pick(cfg.xdir), pick(cfg.ydir), z], axis=-1)


def xyz_to_motor(xyz, cfg: ImportConfig = ImportConfig()):
    """Cartesian -> (motor [N,2], distance [N]). Mirrors Tools.cs:335-339.

    CAUTION (reference bug, kept for parity): this export-path formula does
    NOT invert the import forward map. The forward map (FrmMain.cs:1025-1062)
    uses y = D*sin(pitch)*cos(az), but this inverse solves the model
    y = D*cos(pitch)*sin(az) -- pitch/azimuth roles are swapped. Only the
    recovered distance d and motor_x are consistent with the forward map.
    Use xyz_to_motor_exact for a true inverse.
    """
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    phi = jnp.arcsin(y / z)
    xita = jnp.arctan(x / (z * jnp.cos(phi)))
    motor_x = xita * (-90.0) / jnp.pi + cfg.x_angle
    motor_y = phi * 90.0 / jnp.pi + cfg.y_angle
    d = z / jnp.cos(xita)
    return jnp.stack([motor_x, motor_y], axis=-1), d


def xyz_to_motor_exact(xyz, cfg: ImportConfig = ImportConfig()):
    """True inverse of motor_to_xyz for the canonical xdir=2/ydir=1 geometry.

    Forward: x = D cosP sinA, y = D sinP cosA, z = D cosP with
    P = -(mx - x_angle) * pi/90, A = (my - y_angle) * pi/90.
    Inverse: A = asin(x/z); P = atan(y / (z cosA)); D = z / cosP.
    """
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    az = jnp.arcsin(jnp.clip(x / z, -1.0, 1.0))
    pitch = jnp.arctan(y / (z * jnp.cos(az)))
    d = z / jnp.cos(pitch)
    motor_x = cfg.x_angle - pitch * 90.0 / jnp.pi
    motor_y = cfg.y_angle + az * 90.0 / jnp.pi
    return jnp.stack([motor_x, motor_y], axis=-1), d


def range_gate(rng, cfg: ImportConfig = ImportConfig()):
    """Validity mask for the import range gate (FrmMain.cs:1011)."""
    return (rng != cfg.range_min_exclusive) & (rng <= cfg.range_max)


def distance_window(rng, dis_min: float, dis_max: float):
    """Distance-window filter mask: True = KEEP (reference marks
    isFilterByDistance when outside the OPEN interval, Tools.cs:416-431)."""
    return (rng < dis_max) & (rng > dis_min)

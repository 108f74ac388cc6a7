"""Coordinate conversion round-trip and reference-formula checks."""
import numpy as np
import jax.numpy as jnp

from vtkcloudpoint_tpu.config import ImportConfig
from vtkcloudpoint_tpu.data.convert import (
    xyz_to_motor_exact,
    motor_to_xyz, xyz_to_motor, range_gate, distance_window,
)


def ref_formula(mx, my, D, x_angle, y_angle):
    """Direct transcription of FrmMain.cs:1025-1062 for xdir=2, ydir=1."""
    pitch = -2 * (mx - x_angle) / 180 * np.pi
    az = 2 * (my - y_angle) / 180 * np.pi
    tmpx = D * np.cos(pitch) * np.sin(az)
    tmpy = D * np.sin(pitch) * np.cos(az)
    z = D * np.cos(pitch)
    return np.stack([tmpx, tmpy, z], axis=-1)


def test_forward_matches_reference_formula(rng):
    motor = rng.uniform(-30, 30, size=(100, 2))
    D = rng.uniform(1, 900, size=(100,))
    cfg = ImportConfig(x_angle=1.5, y_angle=-2.0, xdir=2, ydir=1)
    got = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(D), cfg))
    want = ref_formula(motor[:, 0], motor[:, 1], D, 1.5, -2.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_axis_remap():
    motor = np.array([[3.0, 7.0]])
    D = np.array([10.0])
    base = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(D),
                                   ImportConfig(xdir=2, ydir=1)))
    flip = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(D),
                                   ImportConfig(xdir=4, ydir=3)))
    np.testing.assert_allclose(flip[:, 0], -base[:, 0], rtol=1e-12)
    np.testing.assert_allclose(flip[:, 1], -base[:, 1], rtol=1e-12)
    np.testing.assert_allclose(flip[:, 2], base[:, 2], rtol=1e-12)


def test_round_trip_exact(rng):
    """xyz_to_motor_exact inverts the forward map on the canonical
    xdir=2/ydir=1 geometry for in-range angles."""
    motor = rng.uniform(-20, 20, size=(200, 2))
    D = rng.uniform(1, 500, size=(200,))
    cfg = ImportConfig(x_angle=0.7, y_angle=0.3, xdir=2, ydir=1)
    xyz = motor_to_xyz(jnp.asarray(motor), jnp.asarray(D), cfg)
    motor2, D2 = xyz_to_motor_exact(xyz, cfg)
    np.testing.assert_allclose(np.asarray(motor2), motor, atol=1e-9)
    np.testing.assert_allclose(np.asarray(D2), D, rtol=1e-9)


def test_reference_inverse_semantics(rng):
    """xyz_to_motor reproduces the reference export formula (Tools.cs:335-339)
    including its forward/inverse mismatch: motor_x and distance round-trip,
    motor_y does NOT (reference bug, documented in convert.py)."""
    motor = rng.uniform(5, 20, size=(50, 2))
    D = rng.uniform(1, 500, size=(50,))
    cfg = ImportConfig(x_angle=0.0, y_angle=0.0, xdir=2, ydir=1)
    xyz = np.asarray(motor_to_xyz(jnp.asarray(motor), jnp.asarray(D), cfg))
    # direct transcription of the reference export formula
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    phi = np.arcsin(y / z)
    xita = np.arctan(x / (z * np.cos(phi)))
    want_mx = xita * (-90.0) / np.pi + cfg.x_angle
    want_my = phi * 90.0 / np.pi + cfg.y_angle
    want_d = z / np.cos(xita)
    motor2, D2 = xyz_to_motor(jnp.asarray(xyz), cfg)
    motor2, D2 = np.asarray(motor2), np.asarray(D2)
    np.testing.assert_allclose(motor2[:, 0], want_mx, rtol=1e-12)
    np.testing.assert_allclose(motor2[:, 1], want_my, rtol=1e-12)
    np.testing.assert_allclose(D2, want_d, rtol=1e-12)
    # the reference formula does NOT round-trip the forward map (documented
    # reference bug): motor_y deviates
    assert np.abs(motor2[:, 1] - motor[:, 1]).max() > 1e-3


def test_range_gate():
    rng_vals = jnp.asarray([0.0, 0.5, 999.9, 1000.0, 1000.1])
    keep = np.asarray(range_gate(rng_vals))
    # drop D == 0 and D > 1000 (FrmMain.cs:1011)
    np.testing.assert_array_equal(keep, [False, True, True, True, False])


def test_distance_window_open_interval():
    rng_vals = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    keep = np.asarray(distance_window(rng_vals, 2.0, 4.0))
    # reference keeps strictly inside (disMin, disMax) (Tools.cs:421-428)
    np.testing.assert_array_equal(keep, [False, False, True, False, False])

"""Shared deterministic case for the two-process smoke test: both worker
processes and the single-process reference build the SAME block tensor."""
import numpy as np


def make_case(blocks_per_dev=2, ndev=8, cap=64, seed=3):
    rng = np.random.default_rng(seed)
    stripe = np.stack([np.linspace(0, 2.0, 120), np.zeros(120)], axis=1)
    stripe = np.repeat(stripe, 3, axis=0) + \
        0.005 * rng.standard_normal((360, 2))
    blob = np.array([5.0, 5.0]) + 0.01 * rng.standard_normal((40, 2))
    motor = np.concatenate([stripe, blob]).astype(np.float64)
    rng.shuffle(motor)
    B = blocks_per_dev * ndev
    n = len(motor)
    # deterministic round-robin-free fill: sort by x then row-major blocks
    order = np.argsort(motor[:, 0], kind="stable")
    motor = motor[order]
    bc = np.zeros((B, cap, 2), np.float64)
    bv = np.zeros((B, cap), bool)
    per = (n + B - 1) // B
    assert per <= cap
    for b in range(B):
        seg = motor[b * per:(b + 1) * per]
        bc[b, :len(seg)] = seg
        bv[b, :len(seg)] = True
    return bc, bv

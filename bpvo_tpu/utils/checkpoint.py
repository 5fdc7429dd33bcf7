"""Checkpoint / resume for long VO runs.

The reference has no algorithm-state checkpointing (SURVEY.md §5 — persistence
is trajectory/PLY text dumps only).  Here the full device-resident ``VOState``
(keyframe templates, candidate frame, initialization accumulator, trajectory
pose) and the host trajectory round-trip through a single ``.npz`` per step —
enough to resume a sequence mid-run bit-exactly.

Orbax is available in the image for sharded multi-host checkpoints; for the
single-host state (a few MB) plain npz avoids the async machinery.
"""
from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_vo_state(path: str, state, trajectory=None, metadata: dict = None):
    """Serialize a VOState pytree (+ optional Trajectory) to ``path``.npz."""
    arrays, _ = _flatten_with_paths(state)
    payload = {f"state::{k}": v for k, v in arrays.items()}
    if trajectory is not None:
        payload["trajectory"] = np.asarray(
            np.stack(trajectory.poses) if len(trajectory) else
            np.zeros((0, 4, 4)))
    payload["__meta__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_vo_state(path: str, state_template) -> Tuple[object, np.ndarray, dict]:
    """Restore (state, trajectory_poses (N,4,4), metadata) from ``path``.

    ``state_template``: a VOState with the right structure/shapes (e.g. from
    ``DeviceVO.init`` on any frame) used as the pytree skeleton.
    """
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    arrays, treedef = _flatten_with_paths(state_template)
    leaves = []
    for key in arrays:
        leaves.append(jax.numpy.asarray(data[f"state::{key}"]))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    traj = data["trajectory"] if "trajectory" in data else np.zeros((0, 4, 4))
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data \
        else {}
    return state, traj, meta

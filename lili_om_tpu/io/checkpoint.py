"""Checkpoint / resume for the full SLAM state.

The reference has **no** state checkpointing (SURVEY.md §5 — only a final
hardcoded-path PCD dump, BackendFusion.cpp:2697-2722). Since every piece of
our state is a fixed-shape array pytree, checkpointing is a flat
``np.savez``: the odometry state, the fusion window + ring buffer + prior,
the pose graph, and the host keyframe archive. Restore rebuilds the exact
pytrees, so a resumed run continues bit-identically on the same inputs.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(prefix: str, tree: Any, out: dict):
    leaves, treedef = jax.tree.flatten(tree)
    out[f"{prefix}__treedef"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def _unflatten(prefix: str, template: Any, data) -> Any:
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"{prefix}__{i}"]
        new_leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", None)))
    return jax.tree.unflatten(treedef, new_leaves)


def save_system(path: str, system) -> None:
    """Write a LiliOmSystem checkpoint (single .npz + .json sidecar)."""
    out: dict = {}
    _flatten("odo", system.odo_state, out)
    _flatten("fusion", system.fusion_state, out)
    _flatten("graph", system.graph, out)
    for i in range(len(system.kf_clouds)):
        out[f"kf_cloud__{i}"] = system._kf_cloud_np(i)
    for i in range(len(system.kf_edge_clouds)):
        out[f"kf_edge__{i}"] = system._kf_cloud_np(i, system.kf_edge_clouds)
    for i in range(len(system.kf_full_clouds)):
        out[f"kf_full__{i}"] = system._kf_cloud_np(i, system.kf_full_clouds)
    out["kf_stamps"] = np.asarray(system.kf_stamps)
    out["kf_positions"] = (np.stack(system.kf_positions)
                           if system.kf_positions else np.zeros((0, 3)))
    out["imu_stamps"] = system._imu_stamps
    out["imu_accs"] = system._imu_accs
    out["imu_gyrs"] = system._imu_gyrs
    np.savez_compressed(path, **out)
    meta = {
        "n_frames": system.n_frames,
        "n_keyframes": len(system.kf_stamps),
        "last_loop_stamp": system.last_loop_stamp,
        "trajectory": [list(map(float, t)) for t in system.trajectory],
        "frame_stamps": list(map(float, system._frame_stamps)),
        "last_kf_stamp": system._last_kf_stamp,
        "dense_trajectory": [
            [float(s), list(map(float, t)), list(map(float, q))]
            for s, t, q in system.dense_trajectory
        ],
        "prev_kf": (None if system._prev_kf is None else
                    [float(system._prev_kf[0])] +
                    [list(map(float, x)) for x in system._prev_kf[1:]]),
        # host mirrors of device counters — without these, resume re-enters
        # the warmup path (fusion_step(warmup=True) skips correspondences and
        # marginalization for the first window-1 post-resume keyframes)
        "kf_count_host": int(system._kf_count_host),
        "starved_frames": int(system._starved_frames),
        "last_rel_t": list(map(float, system._last_rel_t)),
        "maps_dirty": bool(system._maps_dirty),
        "loop_pairs": [[int(i), int(j)] for i, j in system._loop_pairs],
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_system(path: str, system) -> None:
    """Restore a checkpoint into an already-constructed (same-config)
    LiliOmSystem in place."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    system.odo_state = _unflatten("odo", system.odo_state, data)
    system.fusion_state = _unflatten("fusion", system.fusion_state, data)
    system.graph = _unflatten("graph", system.graph, data)
    system.kf_stamps = [float(s) for s in data["kf_stamps"]]
    system.kf_positions = [p for p in data["kf_positions"]]
    system.kf_clouds = []
    i = 0
    while f"kf_cloud__{i}" in data:
        system.kf_clouds.append(data[f"kf_cloud__{i}"])
        i += 1
    system.kf_edge_clouds = []
    i = 0
    while f"kf_edge__{i}" in data:
        system.kf_edge_clouds.append(data[f"kf_edge__{i}"])
        i += 1
    system.kf_full_clouds = []
    i = 0
    while f"kf_full__{i}" in data:
        system.kf_full_clouds.append(data[f"kf_full__{i}"])
        i += 1
    # older checkpoints predate the edge/full archives — fall back to surf
    if not system.kf_edge_clouds:
        system.kf_edge_clouds = [np.zeros((0, 3)) for _ in system.kf_clouds]
    if not system.kf_full_clouds:
        system.kf_full_clouds = list(system.kf_clouds)
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".json"
    if not os.path.exists(meta_path):
        meta_path = path + ".json"
    with open(meta_path) as f:
        meta = json.load(f)
    system.n_frames = meta["n_frames"]
    system.last_loop_stamp = meta["last_loop_stamp"]
    system.trajectory = [np.asarray(t) for t in meta["trajectory"]]
    system._frame_stamps = list(meta.get("frame_stamps", []))
    system._last_kf_stamp = meta.get("last_kf_stamp")
    system.dense_trajectory = [
        (s, np.asarray(t), np.asarray(q))
        for s, t, q in meta.get("dense_trajectory", [])
    ]
    pk = meta.get("prev_kf")
    system._prev_kf = (None if pk is None else
                       (pk[0], np.asarray(pk[1]), np.asarray(pk[2]), np.asarray(pk[3])))
    system._kf_count_host = int(meta.get("kf_count_host",
                                         system.fusion_state.kf_count))
    system._starved_frames = int(meta.get("starved_frames", 0))
    system._last_rel_t = np.asarray(meta.get("last_rel_t", [0.0, 0.0, 0.0]))
    # older checkpoints predate the incremental map tables: rebuild once
    system._maps_dirty = bool(meta.get("maps_dirty", True))
    system._loop_pairs = [(int(i), int(j))
                          for i, j in meta.get("loop_pairs", [])]
    if "imu_stamps" in data:
        system._imu_stamps = data["imu_stamps"]
        system._imu_accs = data["imu_accs"]
        system._imu_gyrs = data["imu_gyrs"]

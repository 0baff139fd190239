"""Checkpoint / resume for the odometry + mapping state.

The reference has **no** checkpointing (SURVEY.md §5: the map is never
serialised, only published; results files are written once at shutdown,
liodom_node.cc:114-118).  This module adds it as a first-class capability:
the full engine state — odometry window/poses (:class:`OdomState`), the
global hash-grid map (:class:`MapState`), the trajectory so far, and the
frame cursor — is saved via orbax (async-capable, multi-host-aware) so long
runs survive preemption and can be resumed mid-sequence.

Layout: one orbax checkpoint directory per step, ``<dir>/step_<n>/``, with
the pytree under ``state`` and static metadata in ``meta.json``.
"""

from __future__ import annotations

import json
import os
from typing import Any, NamedTuple, Optional, Tuple

import jax
import numpy as np

try:  # orbax is in the base image; keep a crisp error if not
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class EngineCheckpoint(NamedTuple):
    """Everything needed to resume a run mid-sequence."""

    odom_state: Any              # OdomState pytree
    map_state: Optional[Any]     # MapState pytree or None
    trajectory: np.ndarray       # (F, 3, 4) KITTI-format poses so far
    frame_index: int             # next frame to process


def _step_dir(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(os.path.expanduser(directory)),
                        f"step_{step:08d}")


_EMPTY_SENTINEL = np.zeros((1,), np.int8)  # orbax rejects zero-size arrays


def _is_arr(x) -> bool:
    return isinstance(x, (np.ndarray, jax.Array))


def _strip_empty(tree):
    """Replace zero-size array leaves (legal pytree state, e.g. the unused
    received-map buffer) with a 1-byte sentinel orbax can serialise."""
    return jax.tree.map(
        lambda x: _EMPTY_SENTINEL if _is_arr(x) and x.size == 0 else x, tree,
        is_leaf=_is_arr)


def _unstrip_empty(tree, template):
    """Restore zero-size leaves from the template."""
    return jax.tree.map(
        lambda x, t: t if _is_arr(t) and t.size == 0 else x, tree, template,
        is_leaf=_is_arr)


def save(directory: str, step: int, ckpt: EngineCheckpoint,
         extra_meta: Optional[dict] = None) -> str:
    """Write a checkpoint; returns its path."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax.checkpoint is unavailable")
    path = _step_dir(directory, step)
    traj = np.asarray(ckpt.trajectory, dtype=np.float64)
    tree = {
        "odom_state": _strip_empty(ckpt.odom_state),
        "map_state": (_strip_empty(ckpt.map_state)
                      if ckpt.map_state is not None else {}),
        "trajectory": traj if traj.size else _EMPTY_SENTINEL,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), tree, force=True)
    meta = {"frame_index": int(ckpt.frame_index),
            "has_map": ckpt.map_state is not None,
            "format": 1}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def latest_step(directory: str) -> Optional[int]:
    """Highest step with a complete checkpoint in ``directory``, or None."""
    directory = os.path.abspath(os.path.expanduser(directory))
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and os.path.exists(
                os.path.join(directory, name, "meta.json")):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore(directory: str, step: Optional[int] = None,
            template: Optional[dict] = None) -> Tuple[int, EngineCheckpoint]:
    """Load a checkpoint (latest step unless given).

    ``template``: optional {"odom_state": ..., "map_state": ...} pytrees of
    the right structure/shape/dtype — restores arrays as jax arrays matching
    the template (required to round-trip NamedTuple state classes; without
    it, plain nested dicts of numpy arrays are returned)."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax.checkpoint is unavailable")
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = _step_dir(directory, step)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            tmpl = {
                "odom_state": _strip_empty(template["odom_state"]),
                "map_state": _strip_empty(template.get("map_state") or {}),
                "trajectory": np.zeros((1, 3, 4), np.float64),
            }
            restore_args = jax.tree.map(
                lambda x: ocp.RestoreArgs(restore_type=np.ndarray)
                if isinstance(x, np.ndarray)
                else ocp.ArrayRestoreArgs(dtype=x.dtype),
                tmpl,
                is_leaf=lambda x: isinstance(x, (np.ndarray, jax.Array)))
            tree = ckptr.restore(
                os.path.join(path, "state"),
                args=ocp.args.PyTreeRestore(
                    item=tmpl, restore_args=restore_args,
                    partial_restore=False))
        else:
            tree = ckptr.restore(os.path.join(path, "state"))
    odom_state = tree["odom_state"]
    map_state = tree["map_state"] if meta.get("has_map") else None
    if template is not None:
        odom_state = _unstrip_empty(odom_state, template["odom_state"])
        if map_state is not None and template.get("map_state") is not None:
            map_state = _unstrip_empty(map_state, template["map_state"])
    traj = np.asarray(tree["trajectory"])
    if traj.dtype == np.int8:  # empty-trajectory sentinel
        traj = np.zeros((0, 3, 4), np.float64)
    ckpt = EngineCheckpoint(odom_state, map_state, traj,
                            int(meta["frame_index"]))
    return step, ckpt

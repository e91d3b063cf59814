"""Checkpoint / resume (SURVEY §5: the reference has none — params live
only in a flat GPU buffer, main.cu:328-342, and die with the process).

Saves params + optimizer state + occupancy grid + step counter with a
self-contained numpy-npz writer (step_<N>.npz + treedef.json) — no
dependency on optional checkpoint packages; any pytree round-trips
against a structural template.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    """Write `state` (any pytree) to ckpt_dir/step_<N>.npz + treedef.json."""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(flat)}
    path = os.path.join(ckpt_dir, f"step_{step:08d}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    with open(os.path.join(ckpt_dir, "treedef.json"), "w") as fh:
        json.dump({"treedef": str(treedef), "n_leaves": len(flat), "last_step": step}, fh)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)\.npz", name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, os.path.join(ckpt_dir, name))
    return best


def restore_checkpoint(ckpt_dir: str, like: Any) -> Optional[Tuple[int, Any]]:
    """Restore the latest checkpoint into the structure of `like`
    (a template pytree with the right treedef). Returns (step, state)."""
    found = latest_checkpoint(ckpt_dir)
    if found is None:
        return None
    step, path = found
    with np.load(path) as data:
        flat_like, treedef = _flatten_with_paths(like)
        if len(data.files) != len(flat_like):
            raise ValueError(
                f"checkpoint {path} has {len(data.files)} leaves; "
                f"template has {len(flat_like)} — config mismatch?"
            )
        flat = [data[f"leaf_{i}"] for i in range(len(flat_like))]
    state = jax.tree_util.tree_unflatten(treedef, flat)
    return step, state

"""Orbax checkpointing with rotation + training-state resume.

Replaces DeepSpeed save_checkpoint/epoch_{e}_step_{s} rotation keeping the
newest 2 (reference train_..._properties.py:202-220) and the training_state
dict of the ASR script (train_rwkv7_asr_jsonl.py:197-241). Adds mid-epoch
data-position resume, which the reference lacks (SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_dirs(root: str):
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("step_") and os.path.isdir(os.path.join(root, name)):
            try:
                out.append((int(name.split("_")[1]), os.path.join(root, name)))
            except ValueError:
                pass
    return sorted(out)


def save(
    root: str,
    step: int,
    state: Any,
    meta: Optional[Dict[str, Any]] = None,
    keep: int = 2,
) -> str:
    """Save a TrainState (params/opt_state/step pytree) + meta json."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(root, f"step_{step}"))
    os.makedirs(root, exist_ok=True)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f)
    for _, old in _ckpt_dirs(root)[:-keep]:
        shutil.rmtree(old, ignore_errors=True)
    return path


def latest_step(root: str) -> Optional[int]:
    dirs = _ckpt_dirs(root)
    return dirs[-1][0] if dirs else None


def restore(root: str, abstract_state: Any, step: Optional[int] = None) -> Tuple[Any, Dict[str, Any]]:
    """Restore (state, meta). abstract_state: a pytree of like-shaped arrays
    (e.g. a freshly initialized TrainState)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(root)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {root}")
    path = os.path.abspath(os.path.join(root, f"step_{step}"))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            os.path.join(path, "state"),
            jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state),
        )
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def export_params_npz(path: str, params: Any) -> None:
    """Flat .npz export of params (host interchange / quick inspection)."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    arrs = {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}
    np.savez(path, **arrs)

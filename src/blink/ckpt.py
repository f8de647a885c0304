"""Checkpoint/resume of optimization state via safetensors
(SURVEY.md §5 "Checkpoint/resume"): scene params + optax state every K steps
of `fit`; resume is exact because the sampler is counter-based on step index.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from safetensors.numpy import load_file, save_file


def _flatten(tree: Any, prefix: str) -> dict[str, np.ndarray]:
    leaves, _ = jax.tree_util.tree_flatten(tree)
    return {f"{prefix}.{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}


def _unflatten(tree_like: Any, flat: dict[str, np.ndarray], prefix: str) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(tree_like)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = flat[f"{prefix}.{i}"]
        new_leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_ckpt(path: str, step: int, params: Any, opt_state: Any) -> None:
    flat = {"meta.step": np.asarray([step], np.int64)}
    flat.update(_flatten(params, "params"))
    flat.update(_flatten(opt_state, "opt"))
    save_file(flat, path)


def load_ckpt(path: str, params_like: Any, opt_state_like: Any):
    """Returns (step, params, opt_state) with the pytree structure of the
    provided templates (shapes/dtypes restored from the file)."""
    flat = load_file(path)
    step = int(flat["meta.step"][0])
    params = _unflatten(params_like, flat, "params")
    opt_state = _unflatten(opt_state_like, flat, "opt")
    return step, params, opt_state

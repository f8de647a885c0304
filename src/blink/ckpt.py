"""Checkpoint/resume of optimization state via safetensors
(SURVEY.md §5 "Checkpoint/resume"): scene params + optax state every K steps
of `fit`; resume is exact because the sampler is counter-based on step index.

Leaves are keyed by their pytree KEYPATH (not positional index), so loading
into a template with a different `optimize` tuple, param order, or optax
version fails loudly on the mismatched key/shape instead of silently filling
the wrong leaves.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from safetensors.numpy import load_file, save_file


def _flatten(tree: Any, prefix: str) -> dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        f"{prefix}{jax.tree_util.keystr(path)}": np.asarray(leaf)
        for path, leaf in leaves
    }


def _unflatten(tree_like: Any, flat: dict[str, np.ndarray], prefix: str) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree_like)
    new_leaves = []
    for path, leaf in leaves:
        key = f"{prefix}{jax.tree_util.keystr(path)}"
        if key not in flat:
            raise KeyError(
                f"checkpoint is missing leaf '{key}' — saved with a "
                f"different param set / optimizer? (have: {sorted(flat)[:8]}…)"
            )
        arr = flat[key]
        tmpl = np.asarray(leaf)
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint leaf '{key}' has shape {arr.shape}, template "
                f"expects {tmpl.shape}"
            )
        new_leaves.append(np.asarray(arr, dtype=tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_ckpt(path: str, step: int, params: Any, opt_state: Any) -> None:
    flat = {"meta.step": np.asarray([step], np.int64)}
    flat.update(_flatten(params, "params"))
    flat.update(_flatten(opt_state, "opt"))
    save_file(flat, path)


def load_ckpt(path: str, params_like: Any, opt_state_like: Any):
    """Returns (step, params, opt_state) with the pytree structure of the
    provided templates (values restored from the file; keypaths and shapes
    are validated against the templates)."""
    flat = load_file(path)
    step = int(flat["meta.step"][0])
    params = _unflatten(params_like, flat, "params")
    opt_state = _unflatten(opt_state_like, flat, "opt")
    return step, params, opt_state

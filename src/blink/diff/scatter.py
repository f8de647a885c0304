"""Gradient scatter: segment-sum reductions from per-ray gradients into
per-primitive/material parameter gradients (SURVEY.md §2 "Gradient scatter";
BASELINE.json:5 "segment-sum reductions over primitives").

In the pure-JAX path XLA synthesizes these automatically as the transpose of
the parameter gathers in diff.hitrefine. This module provides the explicit
form for (a) the custom-VJP Pallas path, and (b) users accumulating raw
per-hit gradients themselves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def scatter_grads(per_ray: Array, prim_id: Array, n_prims: int) -> Array:
    """Sum per-ray gradient rows into per-primitive buckets.

    per_ray: (N, ...) gradient contributions; prim_id: (N,) i32;
    returns (n_prims, ...). Rays with prim_id outside [0, n_prims) are
    dropped (segment_sum's indices_are_sorted=False path handles this).
    """
    return jax.ops.segment_sum(per_ray, prim_id, num_segments=n_prims)


def scatter_grads_masked(
    per_ray: Array, prim_id: Array, mask: Array, n_prims: int
) -> Array:
    """scatter_grads with an explicit validity mask (miss rays dropped)."""
    safe_id = jnp.where(mask, prim_id, n_prims)  # park invalid in overflow
    out = jax.ops.segment_sum(per_ray, safe_id, num_segments=n_prims + 1)
    return out[:n_prims]

"""Hit records: the integer topology the traversal kernels output.

Design (SURVEY.md §3.2): the traversal/intersection kernels are a *topology
oracle* — they return which primitive each ray hits as integers (plus a f32
t used only for traversal ordering). All differentiable quantities (t, hit
point, normal, uv) are re-derived in closed form from (ray, prim_id, scene)
by blink.diff.hitrefine, so gradients flow through gathers of scene params at
fixed topology exactly as BASELINE.json:5 prescribes ("backward pass scatters
pixel-loss gradients back through hit records").
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.core.struct import pytree_dataclass

Array = jnp.ndarray

KIND_NONE = 0
KIND_SPHERE = 1
KIND_TRI = 2

#: t used as "no hit" sentinel in comparisons (finite to keep grads clean).
T_MAX = 1e30
#: minimum ray t to avoid self-intersection ("shadow acne").
T_MIN = 1e-3


@pytree_dataclass
class Hit:
    """Per-ray hit topology. All fields shape (N,)."""

    t: Array  # f32, T_MAX on miss (non-differentiable; refine re-derives)
    kind: Array  # i32 in {KIND_NONE, KIND_SPHERE, KIND_TRI}
    prim: Array  # i32 primitive index within its kind's array


def miss(n: int) -> Hit:
    return Hit(
        t=jnp.full((n,), T_MAX, jnp.float32),
        kind=jnp.zeros((n,), jnp.int32),
        prim=jnp.zeros((n,), jnp.int32),
    )

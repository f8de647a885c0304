"""Axis-aligned bounding boxes and the branchless ray/slab test.

The slab test here is the exact form the BVH traversal kernels use
(src/blink/kernels/): precomputed inverse directions, min/max swap via
jnp.minimum/maximum so it is watertight for negative-direction rays and
well-defined (via IEEE inf semantics) for axis-parallel rays.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def aabb_union(lo_a: Array, hi_a: Array, lo_b: Array, hi_b: Array):
    return jnp.minimum(lo_a, lo_b), jnp.maximum(hi_a, hi_b)


def aabb_centroid(lo: Array, hi: Array) -> Array:
    return 0.5 * (lo + hi)


def ray_aabb(
    o: Array,
    inv_d: Array,
    t_min: Array,
    t_max: Array,
    box_lo: Array,
    box_hi: Array,
) -> Array:
    """Slab test: True where ray [t_min, t_max] intersects the box.

    All args broadcast; o/inv_d are (...,3), box_lo/box_hi are (...,3),
    t_min/t_max are (...,). inv_d must be 1/d computed WITHOUT epsilon so
    that parallel rays produce +-inf and the min/max logic stays exact.
    """
    t0 = (box_lo - o) * inv_d
    t1 = (box_hi - o) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    # NaNs (0 * inf when the origin lies exactly on a slab of a parallel ray)
    # must not poison the reduction: treat them as non-constraining.
    t_near = jnp.where(jnp.isnan(t_near), -jnp.inf, t_near)
    t_far = jnp.where(jnp.isnan(t_far), jnp.inf, t_far)
    enter = jnp.maximum(jnp.max(t_near, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(t_far, axis=-1), t_max)
    return enter <= exit_

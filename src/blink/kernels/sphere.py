"""Ray-sphere intersection: branchless analytic quadratic
(SURVEY.md §2 "Ray-sphere kernel"; BASELINE.json:5).

Pure jnp so the identical arithmetic runs inside Pallas kernel bodies, in the
vmapped fallback, and on CPU. Returns t = T_MAX on miss.
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.kernels.types import T_MAX

Array = jnp.ndarray


def sphere_t(o: Array, d: Array, center: Array, radius: Array,
             t_min: float | Array, t_max: float | Array = T_MAX) -> Array:
    """Smallest t in [t_min, t_max] where ray o+t*d hits the sphere.

    Broadcasts: o,d (...,3); center (...,3); radius (...). d need not be
    normalized. Branchless: misses return T_MAX.
    """
    oc = o - center
    a = jnp.sum(d * d, axis=-1)
    half_b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = half_b * half_b - a * c
    hit_disc = disc > 0.0
    # Double-where: sqrt must never see <=0 even in the untaken branch, or
    # its inf derivative turns the masked-out gradient into NaN (0 * inf).
    sq = jnp.sqrt(jnp.where(hit_disc, disc, 1.0))
    inv_a = 1.0 / a
    t0 = (-half_b - sq) * inv_a  # near root
    t1 = (-half_b + sq) * inv_a  # far root (ray origin inside sphere)
    t = jnp.where(t0 >= t_min, t0, t1)
    valid = hit_disc & (t >= t_min) & (t <= t_max)
    return jnp.where(valid, t, T_MAX)

"""Ray-triangle intersection: branchless Möller–Trumbore
(SURVEY.md §2 "Ray-triangle kernel"; BASELINE.json:5).

Triangles are passed as (v0, e1, e2) with e1 = v1-v0, e2 = v2-v0 — the
precomputed layout the BVH flattener stores so kernels never gather vertex
indices. Double-sided (no backface cull): the Cornell/box interiors are
viewed from both sides. Misses return t = T_MAX.
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.core import vec
from blink.kernels.types import T_MAX

Array = jnp.ndarray



def triangle_t(o: Array, d: Array, v0: Array, e1: Array, e2: Array,
               t_min: float | Array, t_max: float | Array = T_MAX) -> Array:
    """Smallest-t Möller–Trumbore hit; T_MAX on miss. Broadcasts like jnp."""
    t, _, _ = triangle_tuv(o, d, v0, e1, e2, t_min, t_max)
    return t


def triangle_tuv(o: Array, d: Array, v0: Array, e1: Array, e2: Array,
                 t_min: float | Array, t_max: float | Array = T_MAX):
    """Möller–Trumbore returning (t, u, v); t = T_MAX on miss.

    1/det is taken EXACTLY (guarded only against det == 0): any smooth
    "regularized" inverse (e.g. det/(det^2+eps)) silently corrupts u,v,t
    for small-but-valid determinants — tiny triangles in dense meshes have
    det ~ edge^2 and near-grazing hits are legitimate. Exact division keeps
    the barycentric range checks meaningful at every scale; degenerate/
    parallel cases produce out-of-range u,v,t and fail those checks.
    """
    pvec = vec.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    # Double-where: keep the untaken branch finite so reverse-mode AD never
    # sees inf * 0 (same pattern as kernels.sphere).
    degenerate = det == 0.0
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = vec.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        ~degenerate
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= t_min)
        & (t <= t_max)
    )
    return jnp.where(valid, t, T_MAX), u, v

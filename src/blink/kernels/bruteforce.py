"""Brute-force intersect-all-primitives: the correctness anchor.

Used for (a) the CPU-runnable config-1 oracle path (BASELINE.json:7), and
(b) property tests asserting BVH traversal == brute force (SURVEY.md §4.2).
vmapped over rays; memory is O(rays x prims) per vmap lane so keep scenes
small or chunk at the call site.

Outputs integer topology only (see kernels.types): stop_gradient is applied
to t so autodiff never flows through the argmin select — differentiable
quantities come from blink.diff.hitrefine.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.kernels.sphere import sphere_t
from blink.kernels.triangle import triangle_t
from blink.kernels.types import (
    Hit,
    KIND_NONE,
    KIND_SPHERE,
    KIND_TRI,
    T_MAX,
    T_MIN,
)
from blink.scene.scene import Scene

Array = jnp.ndarray


def _tri_soa(scene: Scene):
    """Gather (v0, e1, e2) SoA from indexed triangles (differentiable)."""
    tris = scene.triangles
    v0 = tris.verts[tris.idx[:, 0]]
    v1 = tris.verts[tris.idx[:, 1]]
    v2 = tris.verts[tris.idx[:, 2]]
    return v0, v1 - v0, v2 - v0


def intersect_brute(o: Array, d: Array, scene: Scene,
                    t_min: float = T_MIN, t_max: float = T_MAX,
                    alive: Array | None = None) -> Hit:
    """Closest hit over all primitives. o,d: (N,3) -> Hit of shape (N,).

    `alive` mask: dead lanes report the canonical miss (t=T_MAX,
    kind=NONE, prim=0), matching kernels.traverse.intersect_bvh."""
    n = o.shape[0]
    best_t = jnp.full((n,), T_MAX, jnp.float32)
    best_kind = jnp.full((n,), KIND_NONE, jnp.int32)
    best_prim = jnp.zeros((n,), jnp.int32)

    if scene.n_spheres > 0:
        ts = jax.vmap(
            lambda oo, dd: sphere_t(
                oo, dd, scene.spheres.center, scene.spheres.radius, t_min, t_max
            )
        )(o, d)  # (N, S)
        s_prim = jnp.argmin(ts, axis=-1)
        s_t = jnp.min(ts, axis=-1)
        upd = s_t < best_t
        best_t = jnp.where(upd, s_t, best_t)
        best_kind = jnp.where(upd, KIND_SPHERE, best_kind)
        best_prim = jnp.where(upd, jnp.asarray(s_prim, jnp.int32), best_prim)

    if scene.n_triangles > 0:
        v0, e1, e2 = _tri_soa(scene)
        ts = jax.vmap(
            lambda oo, dd: triangle_t(oo, dd, v0, e1, e2, t_min, t_max)
        )(o, d)  # (N, T)
        tr_prim = jnp.argmin(ts, axis=-1)
        tr_t = jnp.min(ts, axis=-1)
        upd = tr_t < best_t
        best_t = jnp.where(upd, tr_t, best_t)
        best_kind = jnp.where(upd, KIND_TRI, best_kind)
        best_prim = jnp.where(upd, jnp.asarray(tr_prim, jnp.int32), best_prim)

    if alive is not None:
        best_t = jnp.where(alive, best_t, T_MAX)
        best_kind = jnp.where(alive, best_kind, KIND_NONE)
        best_prim = jnp.where(alive, best_prim, 0)
    return Hit(
        t=jax.lax.stop_gradient(best_t),
        kind=best_kind,
        prim=best_prim,
    )


def occluded_brute(o: Array, d: Array, scene: Scene, t_far: Array,
                   t_min: float = T_MIN) -> Array:
    """Any-hit test in (t_min, t_far): True where the segment is blocked.

    Visibility is inherently discontinuous; callers stop_gradient the mask
    (SURVEY.md §7.2.2).
    """
    t_far = jax.lax.stop_gradient(t_far)
    n = o.shape[0]
    blocked = jnp.zeros((n,), bool)
    if scene.n_spheres > 0:
        ts = jax.vmap(
            lambda oo, dd, tf: sphere_t(
                oo, dd, scene.spheres.center, scene.spheres.radius, t_min, tf
            )
        )(o, d, t_far)
        blocked = blocked | jnp.any(ts < T_MAX, axis=-1)
    if scene.n_triangles > 0:
        v0, e1, e2 = _tri_soa(scene)
        ts = jax.vmap(
            lambda oo, dd, tf: triangle_t(oo, dd, v0, e1, e2, t_min, tf)
        )(o, d, t_far)
        blocked = blocked | jnp.any(ts < T_MAX, axis=-1)
    return jax.lax.stop_gradient(blocked)

"""Next-event-estimation light sampling (SURVEY.md §2 "Sampling";
BASELINE.json:8 "direct lighting + shadow rays").

Samples a point on an emissive primitive (triangle or sphere) with its area
pdf. Fully differentiable w.r.t. light geometry (vertex positions, sphere
center/radius) and — through the caller — emission. Branchless over light
kind via where-select of both hypotheses.
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.core import vec
from blink.scene.scene import LIGHT_SPHERE, Scene, triangle_vertices

Array = jnp.ndarray


def sample_light_point(scene: Scene, light: Array, u1: Array, u2: Array):
    """Sample a point on light index `light` (all args broadcast, (N,)).

    Returns (p, n_l, pdf_area, mat_id):
      p (N,3) point on the light surface,
      n_l (N,3) unit surface normal there,
      pdf_area (N,) area-measure pdf of the sample,
      mat_id (N,) i32 material of the light primitive.
    """
    kind = scene.lights.kind[light]
    prim = scene.lights.prim[light]
    n = light.shape[0]

    p = jnp.zeros((n, 3), jnp.float32)
    n_l = jnp.zeros((n, 3), jnp.float32)
    pdf = jnp.ones((n,), jnp.float32)
    mat = jnp.zeros((n,), jnp.int32)

    if scene.n_triangles > 0:
        tp = jnp.clip(prim, 0, scene.n_triangles - 1)
        v0, v1, v2 = triangle_vertices(scene.triangles, tp)
        su = jnp.sqrt(jnp.maximum(u1, 1e-12))
        b0 = 1.0 - su
        b1 = u2 * su
        pt = (
            b0[..., None] * v0
            + b1[..., None] * v1
            + (1.0 - b0 - b1)[..., None] * v2
        )
        c = vec.cross(v1 - v0, v2 - v0)
        twice_area = vec.length(c)
        nt = c / jnp.maximum(twice_area, vec.EPS)[..., None]
        pdf_t = 2.0 / jnp.maximum(twice_area, vec.EPS)  # 1/area
        is_t = kind != LIGHT_SPHERE
        p = jnp.where(is_t[..., None], pt, p)
        n_l = jnp.where(is_t[..., None], nt, n_l)
        pdf = jnp.where(is_t, pdf_t, pdf)
        mat = jnp.where(is_t, scene.triangles.material_id[tp], mat)

    if scene.n_spheres > 0:
        sp = jnp.clip(prim, 0, scene.n_spheres - 1)
        c = scene.spheres.center[sp]
        r = scene.spheres.radius[sp]
        z = 1.0 - 2.0 * u1
        phi = 2.0 * jnp.pi * u2
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        w = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
        ps = c + r[..., None] * w
        pdf_s = 1.0 / (4.0 * jnp.pi * jnp.maximum(r * r, vec.EPS))
        is_s = kind == LIGHT_SPHERE
        p = jnp.where(is_s[..., None], ps, p)
        n_l = jnp.where(is_s[..., None], w, n_l)
        pdf = jnp.where(is_s, pdf_s, pdf)
        mat = jnp.where(is_s, scene.spheres.material_id[sp], mat)

    return p, n_l, pdf, mat

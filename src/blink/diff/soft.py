"""Soft-visibility gradients for sphere silhouettes.

Fixed-topology differentiation (diff.hitrefine) is exact for shading but
omits visibility-edge (silhouette/coverage) terms, which dominate the
pixel-MSE landscape when optimizing sphere POSITIONS (config 3,
BASELINE.json:9). This module provides the standard remedy (SoftRas-style
soft coverage, specialized to analytic spheres where it is exact-form):

  - the sphere-ray discriminant disc = (oc.d)^2 - |d|^2 (|oc|^2 - r^2) is
    a SMOOTH function of center/radius that crosses zero exactly at the
    silhouette; alpha = sigmoid(disc / (sigma * r^2)) is a differentiable
    coverage weight;
  - the soft radiance blends the nearest soft-covered sphere's shading
    (evaluated at the real hit, or at the closest-approach limit point for
    near-miss rays) with the sphere-free background radiance;
  - the renderer emits  hard + (soft - stop_grad(soft)):  the IMAGE is the
    exact hard render (golden tests unchanged), while the GRADIENT is the
    soft estimator's — which contains the silhouette terms.

Scope: spheres only (the spec's inverse-rendering target); mesh silhouette
gradients would need edge sampling and are out of scope for this round.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.core import vec
from blink.diff.hitrefine import HitGeom
from blink.render.integrators import RAY_EPS, nee_direct
from blink.scene.scene import Scene

Array = jnp.ndarray


def _sphere_soft_terms(o: Array, d: Array, scene: Scene, sigma: float):
    """Per-ray soft coverage of the nearest relevant sphere.

    Returns (alpha, t_star, idx): alpha (N,) differentiable coverage of the
    chosen sphere, t_star (N,) its (pseudo-)hit parameter, idx (N,) i32.
    """
    c = scene.spheres.center  # (S,3)
    r = scene.spheres.radius  # (S,)
    oc = o[:, None, :] - c[None, :, :]  # (N,S,3)
    a = jnp.sum(d * d, axis=-1)[:, None]  # (N,1)
    half_b = jnp.sum(oc * d[:, None, :], axis=-1)  # (N,S)
    cc = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
    disc = half_b * half_b - a * cc  # (N,S), smooth in c and r
    alpha = jax.nn.sigmoid(disc / (sigma * (r * r)[None, :]))

    # Hit parameter: real near-root where disc>0, closest approach else.
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t_hit = jnp.where(disc > 0, (-half_b - sq) / a, -half_b / a)
    # Choose the nearest sphere with non-negligible coverage, in front.
    relevant = (alpha > 1e-3) & (t_hit > RAY_EPS)
    t_sort = jnp.where(relevant, t_hit, 1e30)
    idx = jnp.argmin(t_sort, axis=-1)
    n = o.shape[0]
    rows = jnp.arange(n)
    alpha_sel = jnp.where(relevant[rows, idx], alpha[rows, idx], 0.0)
    return alpha_sel, t_hit[rows, idx], jnp.asarray(idx, jnp.int32)


def _sphere_geom(o: Array, d: Array, scene: Scene, t_star: Array, idx: Array,
                 valid: Array) -> HitGeom:
    """Differentiable shading geometry on sphere `idx` at t_star (real hit
    or closest-approach limit point, projected to the surface)."""
    c = scene.spheres.center[idx]
    r = scene.spheres.radius[idx]
    p_line = o + t_star[:, None] * d
    nrm = vec.normalize(p_line - c)
    p = c + nrm * r[:, None]  # project onto the surface (silhouette limit)
    mat = scene.spheres.material_id[idx]
    albedo = scene.materials.albedo[mat]
    emission = scene.materials.emission[mat]
    vmask = valid[:, None]
    u = 0.5 + jnp.arctan2(nrm[..., 2], nrm[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 + jnp.arcsin(jnp.clip(nrm[..., 1], -1.0, 1.0)) / jnp.pi
    return HitGeom(
        valid=valid,
        t=jnp.where(valid, t_star, 1e30),
        p=jnp.where(vmask, p, 0.0),
        n=jnp.where(vmask, nrm, 0.0),
        uv=jnp.where(vmask, jnp.stack([u, v], -1), 0.0),
        mat=jnp.where(valid, mat, 0),
        albedo=jnp.where(vmask, albedo, 0.0),
        emission=jnp.where(vmask, emission, 0.0),
    )


def li_direct_soft(
    o: Array,
    d: Array,
    keys: Array,
    scene: Scene,
    backend,
    deterministic: bool,
    sigma: float,
) -> Array:
    """Direct-lighting radiance with soft-silhouette sphere gradients.

    Forward value == li_direct exactly (hard + soft - stop_grad(soft));
    backward flows through the soft blend alpha*L_sphere + (1-alpha)*L_bg.
    """
    from blink.render.integrators import li_direct
    from blink.scene.scene import empty_spheres

    hard = li_direct(o, d, keys, scene, backend, deterministic)
    if scene.n_spheres == 0:
        return hard

    # Background: the scene without spheres (triangles only).
    scene_bg = scene.replace(spheres=empty_spheres())
    l_bg = li_direct(o, d, keys, scene_bg, backend, deterministic)

    alpha, t_star, idx = _sphere_soft_terms(o, d, scene, sigma)
    geom = _sphere_geom(o, d, scene, t_star, idx, alpha > 0.0)
    l_sph = geom.emission + nee_direct(
        scene, geom, keys, backend, bounce=0, deterministic=deterministic
    )
    soft = alpha[:, None] * l_sph + (1.0 - alpha[:, None]) * l_bg
    return hard + (soft - jax.lax.stop_gradient(soft))
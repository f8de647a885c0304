"""BRDF evaluation and sampling: Lambertian with textured albedo
(SURVEY.md §2 "BRDF eval + VJP"; BASELINE.json:5,7,10).

eval/pdf/sample are pure jnp and differentiable w.r.t. albedo (and through
it the texture atlas); sample directions use the counter-based sampler so
FD validation perturbs a deterministic function. The analytic VJP for the
Lambertian is trivial (linear in albedo), so plain autodiff is already the
"custom" VJP; the Pallas shading path reuses these exact formulas.
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.core import vec

Array = jnp.ndarray

INV_PI = 1.0 / jnp.pi


def brdf_eval(albedo: Array, wo: Array, wi: Array, n: Array) -> Array:
    """Lambertian BRDF value f(wo, wi): (...,3). Zero below the horizon."""
    up = (vec.vdot(wi, n) > 0.0) & (vec.vdot(wo, n) > 0.0)
    return jnp.where(up[..., None], albedo * INV_PI, 0.0)


def brdf_pdf(wi: Array, n: Array) -> Array:
    """Cosine-hemisphere pdf of wi about n."""
    c = vec.vdot(wi, n)
    return jnp.maximum(c, 0.0) * INV_PI


def sample_cosine(n: Array, u1: Array, u2: Array) -> Array:
    """Cosine-weighted hemisphere sample about unit normal n.

    u1, u2: uniforms in [0,1). Returns unit direction (...,3).
    """
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    t, b, nn = vec.make_onb(n)
    local = jnp.stack([x, y, z], axis=-1)
    return vec.from_local(local, t, b, nn)

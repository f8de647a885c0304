"""Bilinear texture sampling over the scene's texture atlas
(SURVEY.md §2 "Texture sampling"; BASELINE.json:10 "textured BRDFs").

Differentiable w.r.t. both the atlas texels and the uv coordinates (the
latter flow back into geometry via barycentric interpolation of vertex uvs).
Texture id -1 selects a constant 1.0 so `albedo * sample` reduces to the
untextured BRDF without branching.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def sample_texture(atlas: Array, tex_id: Array, uv: Array) -> Array:
    """Bilinear sample.

    atlas: (K, R, R, 3); tex_id: (...,) i32 with -1 = none; uv: (..., 2).
    Returns (..., 3); 1.0 where tex_id < 0 or the atlas is empty.
    """
    ones = jnp.ones(uv.shape[:-1] + (3,), jnp.float32)
    if atlas.shape[0] == 0:
        return ones
    res = atlas.shape[1]
    k = jnp.clip(tex_id, 0, atlas.shape[0] - 1)
    # Wrap uv to [0,1), map to texel centers.
    u = (uv[..., 0] % 1.0) * res - 0.5
    v = (uv[..., 1] % 1.0) * res - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0i = jnp.asarray(u0, jnp.int32) % res
    v0i = jnp.asarray(v0, jnp.int32) % res
    u1i = (u0i + 1) % res
    v1i = (v0i + 1) % res
    t00 = atlas[k, v0i, u0i]
    t01 = atlas[k, v0i, u1i]
    t10 = atlas[k, v1i, u0i]
    t11 = atlas[k, v1i, u1i]
    top = t00 * (1 - fu) + t01 * fu
    bot = t10 * (1 - fu) + t11 * fu
    out = top * (1 - fv) + bot * fv
    return jnp.where((tex_id >= 0)[..., None], out, ones)

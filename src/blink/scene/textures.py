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
    # Neighbor-packed single gather: the four bilinear taps live at
    # (v,u), (v,u+1), (v+1,u), (v+1,u+1); rolling the (small) atlas by -1
    # along each image axis and concatenating channels gives a 12-wide
    # texel record, so the per-ray fetch is ONE width-12 row gather
    # instead of four width-3 gathers (~3 ms each at 262k rays — see
    # core.rows). The rolls are elementwise-cheap (atlas is ~100k texels)
    # and differentiable, so texture gradients flow exactly as before.
    a01 = jnp.roll(atlas, -1, axis=2)
    a10 = jnp.roll(atlas, -1, axis=1)
    a11 = jnp.roll(a10, -1, axis=2)
    packed = jnp.concatenate([atlas, a01, a10, a11], axis=-1)
    flat = packed.reshape(-1, 12)
    fidx = (k * res + v0i) * res + u0i
    rows = flat[fidx]
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv
    out = (
        rows[..., 0:3] * w00
        + rows[..., 3:6] * w01
        + rows[..., 6:9] * w10
        + rows[..., 9:12] * w11
    )
    return jnp.where((tex_id >= 0)[..., None], out, ones)

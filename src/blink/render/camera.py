"""Pinhole camera ray generation (SURVEY.md §2 "Camera ray gen").

Differentiable w.r.t. camera origin, look_at, up, and fov. Pixel jitter is
drawn from the counter-based sampler keyed by (pixel_id, sample_idx) so
renders are reproducible under any ray sharding (BASELINE.json:5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.core import sampler, vec
from blink.scene.scene import Camera

Array = jnp.ndarray


def camera_basis(cam: Camera):
    fwd = vec.normalize(cam.look_at - cam.origin)
    right = vec.normalize(vec.cross(fwd, cam.up))
    up = vec.cross(right, fwd)
    return fwd, right, up


def generate_rays(
    cam: Camera,
    height: int,
    width: int,
    seed_key: Array,
    sample_idx,
    jitter: bool = True,
    pixel_id: Array | None = None,
):
    """Primary rays for one spp sample.

    pixel_id: optional (N,) uint32 subset/permutation of pixels (used by
    the distributed renderer to generate only this shard's rays, and by
    the tiled pallas path). Default: every pixel in row-major order.

    Returns (o, d, keys): o/d (N, 3) with d unit length, and (N, 4)
    uint32 RNG keys for downstream sampling dimensions — columns 0:2 the
    per-(pixel, sample) stream, columns 2:4 the per-(image-block, sample)
    stream (4x32-pixel blocks; shared NEE light samples for shadow-packet
    coherence, see sampler.block_key). Both are keyed by absolute
    pixel/block ids, so any sharding/permutation/compaction renders
    exactly the same image (BASELINE.json:5 reproducibility).
    """
    if pixel_id is None:
        pixel_id = jnp.arange(height * width, dtype=jnp.uint32)
    n = pixel_id.shape[0]
    # sample_idx may be a scalar (classic per-sample loop) or a per-ray
    # array (spp-interleaved packets — render.api.tile_pixel_ids_spp).
    sidx = jnp.broadcast_to(
        jnp.asarray(sample_idx, jnp.uint32), pixel_id.shape
    )
    pixel_keys = jax.vmap(
        lambda p, s: sampler.pixel_key(seed_key, p, s)
    )(pixel_id, sidx)
    nbx = -(-width // 32)
    block_id = (pixel_id // jnp.uint32(width)) // jnp.uint32(4) * jnp.uint32(
        nbx
    ) + (pixel_id % jnp.uint32(width)) // jnp.uint32(32)
    block_keys = jax.vmap(
        lambda b, s: sampler.block_key(seed_key, b, s)
    )(block_id, sidx)
    pixel_keys = jnp.concatenate([pixel_keys, block_keys], axis=-1)
    if jitter:
        uv = jax.vmap(lambda k: sampler.uniform(k, (2,), dim=0))(
            pixel_keys[..., :2]
        )
        jx, jy = uv[:, 0], uv[:, 1]
    else:
        jx = jnp.full((n,), 0.5, jnp.float32)
        jy = jnp.full((n,), 0.5, jnp.float32)

    i = (pixel_id // width).astype(jnp.float32)  # row
    j = (pixel_id % width).astype(jnp.float32)  # col
    half_h = jnp.tan(jnp.deg2rad(cam.fov_deg) * 0.5)
    aspect = width / height
    ndc_x = ((j + jx) / width * 2.0 - 1.0) * half_h * aspect
    ndc_y = (1.0 - (i + jy) / height * 2.0) * half_h

    fwd, right, up = camera_basis(cam)
    d = vec.normalize(
        fwd[None, :] + ndc_x[:, None] * right[None, :] + ndc_y[:, None] * up[None, :]
    )
    o = jnp.broadcast_to(cam.origin, d.shape)
    return o, d, pixel_keys

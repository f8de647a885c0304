"""Counter-based random streams.

Every random decision in the renderer is a pure function of
(seed, pixel_id, sample_idx, bounce, dimension): reproducible, order
independent, and therefore identical under any ray sharding or compaction
order. This is the TPU-native replacement for stateful per-thread RNGs
(BASELINE.json:5 "megakernel-free ray batches" requires order-independent
sampling; SURVEY.md §2 "RNG/sampler").

Implementation: a murmur3-finalizer hash chain over plain uint32 states.
Threefry `jax.random.fold_in` chains were measured at ~4.5 ms per 262k-ray
sweep on the axon v5e (benchmarks/stage_probe2.py) — raygen paid two and
every NEE/bounce dimension two more, ~20 ms/frame at 512^2. The murmur
finalizer is ~6 elementwise u32 ops that fuse into neighbouring compute
for free, with full avalanche (every input bit flips every output bit
with ~1/2 probability — the property MC sampling needs). Keys are (N,)
uint32 and travel with rays through sharding/compaction like any other
per-ray attribute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

#: 2^32 * golden ratio — the Weyl increment decorrelating fold steps.
_GOLDEN = 0x9E3779B9


def _mix(x: Array) -> Array:
    """murmur3/splitmix 32-bit finalizer (full avalanche)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def fold(key: Array, data) -> Array:
    """Mix `data` into `key` (the fold_in analog; associatively chained)."""
    d = jnp.asarray(data, jnp.uint32)
    return _mix(key ^ (d * jnp.uint32(_GOLDEN) + jnp.uint32(0x85EBCA6B)))


def _seed_u32(seed_key) -> Array:
    """Accept a typed jax PRNG key, a raw uint32 array, or a python int."""
    if hasattr(seed_key, "dtype") and jnp.issubdtype(
        getattr(seed_key, "dtype", None), jax.dtypes.prng_key
    ):
        data = jax.random.key_data(seed_key)
        acc = jnp.zeros((), jnp.uint32)
        for i in range(data.shape[-1]):
            acc = fold(acc, data[..., i])
        return acc
    return _mix(jnp.asarray(seed_key, jnp.uint32))


def pixel_key(seed_key, pixel_id: Array, sample_idx) -> Array:
    """Key for one (pixel, spp-sample) pair. vmap over pixel_id."""
    return fold(fold(_seed_u32(seed_key), pixel_id), sample_idx)


def bounce_key(pk: Array, bounce) -> Array:
    """Key for one path vertex of a pixel-sample stream."""
    return fold(pk, bounce)


def _to_unit(h: Array) -> Array:
    """uint32 -> [0, 1) float32 using the top 24 bits (exact in f32)."""
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform(key: Array, shape=(), dim: int = 0) -> Array:
    """Uniform [0,1) draw(s) for logical dimension `dim` of a stream."""
    n = 1
    for s in shape:
        n *= s
    # Each scalar of the draw gets its own sub-dimension counter; dims are
    # spaced x16 so a dim never collides with another dim's elements.
    ctr = jnp.uint32(dim * 16) + jnp.arange(n, dtype=jnp.uint32)
    return _to_unit(fold(key, ctr)).reshape(shape)


def uniform2(key: Array, dim: int = 0) -> tuple[Array, Array]:
    u = uniform(key, (2,), dim)
    return u[0], u[1]

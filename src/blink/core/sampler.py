"""Counter-based random streams.

Every random decision in the renderer is a pure function of
(seed, pixel_id, sample_idx, bounce, dimension): reproducible, order
independent, and therefore identical under any ray sharding or compaction
order. This is the TPU-native replacement for stateful per-thread RNGs
(BASELINE.json:5 "megakernel-free ray batches" requires order-independent
sampling; SURVEY.md §2 "RNG/sampler").

Implementation: a murmur3-finalizer hash chain over a TWO-WORD uint32
state (64 bits). Threefry `jax.random.fold_in` chains were measured at
~4.5 ms per 262k-ray sweep on the axon v5e (benchmarks/stage_probe2.py) —
raygen paid two and every NEE/bounce dimension two more, ~20 ms/frame at
512^2. The murmur finalizer is ~6 elementwise u32 ops per word that fuse
into neighbouring compute for free, with full avalanche (every input bit
flips every output bit with ~1/2 probability — the property MC sampling
needs).

Why two words: a single 32-bit state gives only 2^32 distinct streams.
The 'pod' preset draws 4096*4096*64spp ≈ 2^30 pixel-sample streams;
birthday collisions in a 2^32 space would make a large fraction of
streams duplicate another stream's ENTIRE random sequence — correlated
noise that never averages out. With 64 bits of state (two independently
keyed words, cross-fed for joint avalanche) the pairwise collision
probability is ~2^-64 and the expected number of colliding stream pairs
at pod scale is ~2^(2*30-1-64) ≈ 1e-2: none in practice.

Keys are (..., 2) uint32 and travel with rays through sharding and
compaction like any other per-ray attribute.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

#: 2^32 * golden ratio — the Weyl increment decorrelating fold steps.
_GOLDEN = 0x9E3779B9
#: A second odd constant (2^32/pi) keying the high word independently.
_GOLDEN2 = 0x517CC1B7


def _mix(x: Array) -> Array:
    """32-bit finalizer, lowbias32 variant (full avalanche)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _mix2(x: Array) -> Array:
    """32-bit finalizer, classic murmur3 constants — a hash function
    independent of `_mix` so the two state words collide independently."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def fold(key: Array, data) -> Array:
    """Mix `data` into the two-word `key` (the fold_in analog).

    `key` has shape (..., 2); `data` is any uint32-castable array that
    broadcasts against key[..., 0]. The low word hashes (lo, data) with
    one finalizer, the high word hashes (hi, data) with an independent
    finalizer and is cross-fed the new low word, so the PAIR only
    collides when two 64-bit states collide (~2^-64 per pair) and a
    single fold avalanches across all 64 output bits.
    """
    key = jnp.asarray(key, jnp.uint32)
    d = jnp.asarray(data, jnp.uint32)
    lo = _mix(key[..., 0] ^ (d * jnp.uint32(_GOLDEN) + jnp.uint32(0x85EBCA6B)))
    hi = _mix2(
        key[..., 1] ^ (d * jnp.uint32(_GOLDEN2) + jnp.uint32(0x27220A95)) ^ lo
    )
    return jnp.stack(jnp.broadcast_arrays(lo, hi), axis=-1)


def _seed_key(seed_key) -> Array:
    """Accept a typed jax PRNG key, a raw uint32 array, or a python int;
    return the (2,) uint32 root state."""
    zero = jnp.zeros((2,), jnp.uint32)
    if hasattr(seed_key, "dtype") and jnp.issubdtype(
        getattr(seed_key, "dtype", None), jax.dtypes.prng_key
    ):
        data = jax.random.key_data(seed_key)
        acc = zero
        for i in range(data.shape[-1]):
            acc = fold(acc, data[..., i])
        return acc
    return fold(zero, jnp.asarray(seed_key, jnp.uint32))


# Backwards-compatible alias (tests/benchmarks may hold the old name).
_seed_u32 = _seed_key


def pixel_key(seed_key, pixel_id: Array, sample_idx) -> Array:
    """Key for one (pixel, spp-sample) pair: shape (2,). vmap over pixel_id."""
    return fold(fold(_seed_key(seed_key), pixel_id), sample_idx)


def bounce_key(pk: Array, bounce) -> Array:
    """Key for one path vertex of a pixel-sample stream."""
    return fold(pk, bounce)


#: Namespace constant separating block streams from pixel streams (folded
#: in first, so block id b can never alias pixel id p's stream).
_BLOCK_NS = 0xB10C_B10C


def block_key(seed_key, block_id: Array, sample_idx) -> Array:
    """Key for one (image-block, spp-sample) stream: shape (2,).

    Image-space blocks (4 rows x 32 cols — the pixel footprint of one
    128-lane kernel row in the tiled layout) share one NEE light sample
    for shadow-packet coherence (render.integrators.NEE_SHARE_ROW). Keyed
    by absolute block id + sample, NOT by ray order: radiance stays
    identical under any sharding, compaction, or tile permutation (the
    sampler's order-independence invariant)."""
    return fold(fold(fold(_seed_key(seed_key), _BLOCK_NS), block_id),
                sample_idx)


def _to_unit(h: Array) -> Array:
    """uint32 -> [0, 1) float32 using the top 24 bits (exact in f32)."""
    return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


#: Counter stride between logical dimensions of one stream. uniform()
#: asserts n <= _DIM_STRIDE so a draw can never run into the next dim.
_DIM_STRIDE = 16


def uniform(key: Array, shape=(), dim: int = 0) -> Array:
    """Uniform [0,1) draw(s) for logical dimension `dim` of a stream.

    The output word is the cross-fed HIGH word of the folded state, which
    depends on all 64 state bits. Draws of up to _DIM_STRIDE scalars per
    dim get distinct counters; larger draws would silently alias the next
    dim's counters, so they are rejected at trace time.
    """
    n = 1
    for s in shape:
        n *= s
    if n > _DIM_STRIDE:
        raise ValueError(
            f"uniform() draw of {n} > {_DIM_STRIDE} scalars would alias the "
            f"next dimension's counters; split across dims instead"
        )
    ctr = jnp.uint32(dim * _DIM_STRIDE) + jnp.arange(n, dtype=jnp.uint32)
    return _to_unit(fold(key, ctr)[..., 1]).reshape(shape)


def uniform2(key: Array, dim: int = 0) -> tuple[Array, Array]:
    u = uniform(key, (2,), dim)
    return u[0], u[1]

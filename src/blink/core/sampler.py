"""Counter-based random streams.

Every random decision in the renderer is a pure function of
(seed, pixel_id, sample_idx, bounce, dimension): reproducible, order
independent, and therefore identical under any ray sharding or compaction
order. This is the TPU-native replacement for stateful per-thread RNGs
(BASELINE.json:5 "megakernel-free ray batches" requires order-independent
sampling; SURVEY.md §2 "RNG/sampler").

Implementation: jax.random threefry keys with fold_in chains. fold_in is
cheap (one threefry round-trip) and vmaps cleanly over pixel ids.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def pixel_key(seed_key: Array, pixel_id: Array, sample_idx) -> Array:
    """Key for one (pixel, spp-sample) pair. vmap over pixel_id."""
    return jax.random.fold_in(jax.random.fold_in(seed_key, pixel_id), sample_idx)


def bounce_key(pk: Array, bounce) -> Array:
    """Key for one path vertex of a pixel-sample stream."""
    return jax.random.fold_in(pk, bounce)


def uniform(key: Array, shape=(), dim: int = 0) -> Array:
    """Uniform [0,1) draw for logical dimension `dim` of a stream."""
    return jax.random.uniform(jax.random.fold_in(key, dim), shape, jnp.float32)


def uniform2(key: Array, dim: int = 0) -> tuple[Array, Array]:
    u = jax.random.uniform(jax.random.fold_in(key, dim), (2,), jnp.float32)
    return u[0], u[1]

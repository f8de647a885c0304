"""Wavefront ray compaction (SURVEY.md §2 "Wavefront ray compaction";
BASELINE.json:5 "sorted ray compaction in HBM").

Between bounces the live-ray set shrinks and scatters; the path integrator
re-sorts rays so that (a) dead rays sink to the tail (packets of the
Pallas traversal terminate early on all-dead tiles) and (b) live rays are
grouped by direction octant + origin Morton cell, restoring the spatial
coherence the packet kernel exploits (SURVEY.md §7.2.1; the ray-stream
idea of PAPERS.md). Sorting happens in HBM via XLA's jnp.argsort — this is
the megakernel-free wavefront form: traversal, shading, and compaction are
separate kernels inside one XLA program.

Compaction is a pure permutation: RNG keys travel with rays (counter-based
on pixel id), so the rendered image is bit-identical with or without it.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def compaction_order(alive: Array, o: Array, d: Array, cells: int = 16) -> Array:
    """Permutation sorting rays by (dead, direction octant, origin cell).

    alive: (N,) bool; o, d: (N,3). Dead rays sort last; live rays group by
    the 3-bit direction octant then a coarse Morton cell of the origin
    (cells^3 bins) for spatial coherence.
    """
    octant = (
        (d[..., 0] < 0).astype(jnp.int32)
        + 2 * (d[..., 1] < 0).astype(jnp.int32)
        + 4 * (d[..., 2] < 0).astype(jnp.int32)
    )
    lo = jnp.min(o, axis=0)
    hi = jnp.max(o, axis=0)
    q = jnp.clip(
        ((o - lo) / jnp.maximum(hi - lo, 1e-12) * cells).astype(jnp.int32),
        0,
        cells - 1,
    )
    # 3-D cell id in Morton-ish (interleave-free, row-major) order — cheap
    # and adequate at this granularity.
    cell = (q[..., 0] * cells + q[..., 1]) * cells + q[..., 2]
    key = jnp.where(
        alive,
        octant * (cells**3) + cell,
        8 * (cells**3),  # dead rays: one tail bucket
    )
    return jnp.argsort(key, stable=True)

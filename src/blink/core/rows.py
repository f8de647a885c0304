"""Row-selection primitives tuned for the TPU's measured gather costs.

benchmarks/dispatch_probe.py (axon v5e, 2026-08-17) established:

  - a gather of N rows costs ~8 ns/row regardless of table size, plus a
    ~2-3 ms fixed per-op overhead — ~3 ms per gather at N=262k rays;
  - fused elementwise chains are effectively free (flat ~3 ms for 1..64
    chained ops over the whole batch);
  - row WIDTH is sublinear: one (V,16) gather costs ~2x a (V,) gather,
    not 16x.

So: small tables (materials, lights, spheres — tens of rows) are selected
with a branchless where-SWEEP (pure elementwise, zero gathers, exact
autodiff transpose = per-row masked sums), and large tables (per-triangle
shading attributes) are packed WIDE so each consumer pays ONE row gather
instead of ~10 narrow ones (scene.shade).
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

#: tables with at most this many rows are swept instead of gathered.
SWEEP_MAX = 32


def select_rows(table: Array, idx: Array, sweep_max: int = SWEEP_MAX) -> Array:
    """table[idx] with a where-sweep when the table is small.

    table: (M, W) (or (M,) treated as (M, 1) -> returns (...,)).
    idx: (...,) i32, assumed in [0, M). Differentiable w.r.t. table in
    both regimes (the sweep's transpose is M masked reductions; the
    gather's is a scatter-add).
    """
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
    m = table.shape[0]
    if 0 < m <= sweep_max:
        out = jnp.broadcast_to(
            table[0], idx.shape + (table.shape[1],)
        )
        for k in range(1, m):
            out = jnp.where((idx == k)[..., None], table[k], out)
    else:
        out = table[idx]
    return out[..., 0] if squeeze else out

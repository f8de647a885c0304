"""Flat BVH arrays (SURVEY.md §2 "BVH builder (flat)"; BASELINE.json:8).

Layout: nodes in DFS preorder with skip links — the stackless traversal
order (SURVEY.md §7.2.1). For every node, the successor when its box is hit
is `node+1`; when missed (or its subtree is done) it is `skip[node]`. A
leaf's subtree is itself, so skip[leaf] == leaf+1 and the update rule is
uniform: `node = hit ? node+1 : skip[node]`.

Triangle data is reordered by leaf and stored as (v0, e1, e2) SoA so leaf
tests are contiguous loads with no index gather; `tri_id` maps back to the
original triangle index (the integer the Hit record reports, which the
differentiable refine layer gathers scene params with).
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.core.struct import pytree_dataclass, static_field

Array = jnp.ndarray


@pytree_dataclass
class FlatBVH:
    # Node arrays, DFS preorder. Padded/degenerate nodes have inverted
    # bounds (lo=+inf, hi=-inf) so every ray-box test misses them.
    lo: Array  # (N, 3) f32
    hi: Array  # (N, 3) f32
    skip: Array  # (N,) i32 preorder successor when box missed
    first: Array  # (N,) i32 first primitive slot (leaves; 0 otherwise)
    count: Array  # (N,) i32 primitives in leaf (0 for internal/padding)
    # Reordered triangle SoA (length padded to a multiple of leaf_size).
    tv0: Array  # (P, 3) f32
    te1: Array  # (P, 3) f32
    te2: Array  # (P, 3) f32
    tri_id: Array  # (P,) i32 original triangle index (-1 padding)
    # Heap(level-order) -> preorder permutation, concatenated level by level
    # (root..leaves). Static topology; lets refit_bvh rebuild bounds on
    # device with log-depth pooling + one scatter.
    heap2pre: Array = None  # (N,) i32
    leaf_size: int = static_field(default=4)

    @property
    def n_nodes(self) -> int:
        return self.skip.shape[0]

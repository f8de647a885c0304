"""Host-side BVH build: Morton-ordered implicit LBVH, flattened to DFS
preorder with skip links (SURVEY.md §2 "BVH builder (flat)", §3.4).

Construction (fully vectorized numpy — no Python-per-node loops, so 1M-tri
builds take seconds):
  1. Triangle centroids -> 30-bit Morton codes -> argsort (the radix order).
  2. Consecutive runs of `leaf_size` sorted triangles become leaves; the
     leaf count is padded to a power of two L (padding leaves/subtrees get
     the far-away EMPTY_BOX point box, which every ray-box test rejects —
     see the EMPTY_BOX note below for why inverted bounds would be wrong).
  3. The hierarchy is the implicit perfect binary tree over the L leaves
     (Morton-order median splits == LBVH radix splits). Bounds are refit
     bottom-up one level at a time with reshape+min/max.
  4. Heap (level, pos) -> DFS-preorder index has a closed form for perfect
     trees: pre(child) = pre(parent) + 1 (+ subtree size if right child);
     skip(node) = pre(node) + subtree_size(level). Nodes are scattered into
     preorder arrays; traversal is then the uniform stackless walk
     documented in bvh.types.

The build crosses host->device exactly once (jnp.asarray of the flat
arrays). Topology is fixed; refit_bvh (device-side, differentiable-safe)
recomputes bounds when vertices move during inverse rendering.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blink.bvh.types import FlatBVH
from blink.scene.scene import Triangles


#: Empty subtrees are a FAR-AWAY POINT BOX, not inverted bounds: the
#: min/max-swapped slab test treats an inverted box [+inf,-inf] as an
#: INFINITE box (swap makes [a,b] == [b,a]), which made every ray "hit"
#: every padding node and walk the whole padded tail. A point box at
#: (1e30,)*3 fails near<=far for any ray not passing exactly through it
#: (and a measure-zero false hit is still correct: count==0 leaves test
#: no primitives).
EMPTY_BOX = 1e30


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coords -> 30-bit Morton codes. x: (T,3) in [0,1)."""
    q = np.clip((x * 1024.0).astype(np.uint32), 0, 1023).astype(np.uint64)

    def spread(v: np.ndarray) -> np.ndarray:
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return (
        (spread(q[:, 0]) << np.uint64(2))
        | (spread(q[:, 1]) << np.uint64(1))
        | spread(q[:, 2])
    )


def build_boxtree(blo: np.ndarray, bhi: np.ndarray, leaf_size: int):
    """Core builder: Morton-ordered implicit tree over arbitrary boxes.

    blo/bhi: (T, 3) element bounds. Returns the preorder node arrays plus
    the Morton `order` (element permutation) and the heap2pre map:
    (lo, hi, skip, first, count, order, heap2pre). Shared by the triangle
    BVH (build_flat_bvh) and the TLAS over instances (bvh.tlas).
    """
    T = blo.shape[0]
    K = leaf_size
    cent = 0.5 * (blo + bhi)
    scene_lo = cent.min(axis=0)
    scene_hi = cent.max(axis=0)
    norm = (cent - scene_lo) / np.maximum(scene_hi - scene_lo, 1e-12)
    order = np.argsort(_morton3(norm), kind="stable")

    n_leaves = -(-T // K)
    depth = max(int(np.ceil(np.log2(max(n_leaves, 1)))), 0)
    L = 1 << depth
    P = L * K

    def pad(a: np.ndarray, fill: float) -> np.ndarray:
        out = np.full((P,) + a.shape[1:], fill, a.dtype)
        out[:T] = a
        return out

    leaf_lo = pad(blo[order], np.inf).reshape(L, K, 3).min(axis=1)
    leaf_hi = pad(bhi[order], -np.inf).reshape(L, K, 3).max(axis=1)

    lo_levels = [None] * (depth + 1)
    hi_levels = [None] * (depth + 1)
    lo_levels[depth] = leaf_lo
    hi_levels[depth] = leaf_hi
    for l in range(depth - 1, -1, -1):
        lo_levels[l] = lo_levels[l + 1].reshape(-1, 2, 3).min(axis=1)
        hi_levels[l] = hi_levels[l + 1].reshape(-1, 2, 3).max(axis=1)

    n_nodes = 2 * L - 1
    lo = np.empty((n_nodes, 3), np.float32)
    hi = np.empty((n_nodes, 3), np.float32)
    skip = np.empty((n_nodes,), np.int64)
    first = np.zeros((n_nodes,), np.int64)
    count = np.zeros((n_nodes,), np.int64)

    def subtree(l: int) -> int:
        return (1 << (depth - l + 1)) - 1

    leaf_count = np.clip(T - np.arange(L) * K, 0, K)
    heap2pre = []
    for l in range(depth + 1):
        k = np.arange(1 << l)
        pre = np.zeros_like(k)
        for j in range(1, l + 1):
            bit = (k >> (l - j)) & 1
            pre += 1 + bit * subtree(j)
        heap2pre.append(pre)
        lo[pre] = lo_levels[l]
        hi[pre] = hi_levels[l]
        skip[pre] = pre + subtree(l)
        if l == depth:
            first[pre] = k * K
            count[pre] = leaf_count
    empty = (
        ~np.isfinite(lo).all(axis=1)
        | ~np.isfinite(hi).all(axis=1)
        | (hi < lo).any(axis=1)
    )
    lo[empty] = EMPTY_BOX
    hi[empty] = EMPTY_BOX
    return lo, hi, skip, first, count, order, np.concatenate(heap2pre)


def build_flat_bvh(tris: Triangles, leaf_size: int = 16) -> FlatBVH:
    v = np.asarray(tris.verts, np.float32)
    idx = np.asarray(tris.idx, np.int64)
    T = idx.shape[0]
    K = leaf_size

    if T == 0:
        far = np.full((1, 3), EMPTY_BOX, np.float32)
        return FlatBVH(
            lo=jnp.asarray(far),
            hi=jnp.asarray(far),
            skip=jnp.asarray([1], jnp.int32),
            first=jnp.asarray([0], jnp.int32),
            count=jnp.asarray([0], jnp.int32),
            tv0=jnp.zeros((K, 3), jnp.float32),
            te1=jnp.zeros((K, 3), jnp.float32),
            te2=jnp.zeros((K, 3), jnp.float32),
            tri_id=-jnp.ones((K,), jnp.int32),
            leaf_size=K,
        )

    p0, p1, p2 = v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]
    tlo = np.minimum(np.minimum(p0, p1), p2)
    thi = np.maximum(np.maximum(p0, p1), p2)
    lo, hi, skip, first, count, order, heap2pre = build_boxtree(tlo, thi, K)

    # Reordered, padded triangle SoA.
    n_leaves = -(-T // K)
    L = 1 << max(int(np.ceil(np.log2(max(n_leaves, 1)))), 0)
    P = L * K

    def pad(a: np.ndarray, fill: float) -> np.ndarray:
        out = np.full((P,) + a.shape[1:], fill, a.dtype)
        out[:T] = a
        return out

    sp0, sp1, sp2 = p0[order], p1[order], p2[order]
    tv0 = pad(sp0, 0.0)
    te1 = pad(sp1 - sp0, 0.0)
    te2 = pad(sp2 - sp0, 0.0)
    tri_id = np.full((P,), -1, np.int64)
    tri_id[:T] = order

    return FlatBVH(
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        skip=jnp.asarray(skip, jnp.int32),
        first=jnp.asarray(first, jnp.int32),
        count=jnp.asarray(count, jnp.int32),
        tv0=jnp.asarray(tv0),
        te1=jnp.asarray(te1),
        te2=jnp.asarray(te2),
        tri_id=jnp.asarray(tri_id, jnp.int32),
        heap2pre=jnp.asarray(heap2pre, jnp.int32),
        leaf_size=K,
    )


def refit_bvh(bvh: FlatBVH, tris: Triangles) -> FlatBVH:
    """Device-side bounds refit at fixed topology (vertices moved, e.g.
    during inverse rendering over tri_verts). Jit-safe: log-depth pooling
    over the implicit heap levels, then one scatter through the stored
    heap2pre permutation. Bounds are non-differentiable control structure
    (topology oracle); the refit keeps traversal exact after geometry
    updates without a host round-trip.
    """
    K = bvh.leaf_size
    # Recompute reordered triangle SoA from the (possibly updated) verts.
    ok = bvh.tri_id >= 0
    safe = jnp.maximum(bvh.tri_id, 0)
    i = tris.idx[safe]
    a = tris.verts[i[:, 0]]
    b = tris.verts[i[:, 1]]
    c = tris.verts[i[:, 2]]
    zero = jnp.zeros_like(a)
    tv0 = jnp.where(ok[:, None], a, zero)
    te1 = jnp.where(ok[:, None], b - a, zero)
    te2 = jnp.where(ok[:, None], c - a, zero)

    plo = jnp.where(
        ok[:, None],
        jnp.minimum(jnp.minimum(a, b), c),
        jnp.full_like(a, jnp.inf),
    )
    phi = jnp.where(
        ok[:, None],
        jnp.maximum(jnp.maximum(a, b), c),
        jnp.full_like(a, -jnp.inf),
    )

    n_total_leaves = bvh.tri_id.shape[0] // K
    depth = int(np.log2(max(n_total_leaves, 1)))
    cur_lo = plo.reshape(n_total_leaves, K, 3).min(axis=1)
    cur_hi = phi.reshape(n_total_leaves, K, 3).max(axis=1)
    levels_lo = [cur_lo]
    levels_hi = [cur_hi]
    for _ in range(depth):
        cur_lo = cur_lo.reshape(-1, 2, 3).min(axis=1)
        cur_hi = cur_hi.reshape(-1, 2, 3).max(axis=1)
        levels_lo.append(cur_lo)
        levels_hi.append(cur_hi)
    # heap order = root..leaves; we built leaves..root.
    heap_lo = jnp.concatenate(levels_lo[::-1], axis=0)
    heap_hi = jnp.concatenate(levels_hi[::-1], axis=0)
    # Empty subtrees -> far point box (see EMPTY_BOX above).
    empty = ~(
        jnp.isfinite(heap_lo).all(axis=1) & jnp.isfinite(heap_hi).all(axis=1)
    ) | (heap_hi < heap_lo).any(axis=1)
    heap_lo = jnp.where(empty[:, None], EMPTY_BOX, heap_lo)
    heap_hi = jnp.where(empty[:, None], EMPTY_BOX, heap_hi)
    lo = jnp.zeros_like(bvh.lo).at[bvh.heap2pre].set(heap_lo)
    hi = jnp.zeros_like(bvh.hi).at[bvh.heap2pre].set(heap_hi)
    return bvh.replace(lo=lo, hi=hi, tv0=tv0, te1=te1, te2=te2)

"""Scene/primitive sharding (SURVEY.md §2 "Parallelism: scene sharding";
BASELINE.json:5 "scene/primitive replication OR SHARDING as needed").

The escape hatch for scenes whose geometry exceeds per-chip HBM: the
triangle set is split into Morton ranges, one per device; RAYS are
replicated instead of sharded. Each device traverses only its shard and
the per-ray closest hits are combined across the mesh with an
all-gather + argmin (and occlusion with a boolean all-reduce). Topology
stays exact: min over a partition of the primitive set equals the global
min.

This composes with the ray-sharded path (dist.render) as a 2-D mesh in
principle; at spec scales (<= 1M tris fits one chip) the 1-D form here is
the correctness/structure reference, tested on the virtual CPU mesh.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from blink.dist.mesh import AXIS, P, make_mesh
from blink.kernels.types import Hit, KIND_NONE, KIND_SPHERE, KIND_TRI, T_MAX
from blink.scene.scene import Scene, Triangles

Array = jnp.ndarray


def shard_scene_triangles(scene: Scene, n_shards: int) -> Scene:
    """Reorder + pad triangles so shard i owns rows [i*S, (i+1)*S).

    Shards are contiguous Morton ranges (spatially compact, like the
    chunked traversal). Returns a scene whose triangle arrays are padded
    to n_shards * S rows; material/uv indices are preserved, and padding
    triangles are degenerate (det == 0, never hit).
    """
    from blink.bvh.build import _morton3

    tris = scene.triangles
    v = np.asarray(tris.verts, np.float32)
    idx = np.asarray(tris.idx, np.int64)
    t = idx.shape[0]
    # The sharded combine packs winners as (kind << 28) | prim in int32
    # (intersect_scene_sharded); prim >= 2^28 would corrupt the kind bits
    # silently. Fail loudly instead (spec scenes are ~1M tris).
    if t >= (1 << 28):
        raise ValueError(
            f"scene sharding supports < 2^28 triangles (got {t}); widen the "
            "packed winner code to int64 to go beyond"
        )
    cent = (v[idx[:, 0]] + v[idx[:, 1]] + v[idx[:, 2]]) / 3.0
    lo, hi = cent.min(0), cent.max(0)
    order = np.argsort(
        _morton3((cent - lo) / np.maximum(hi - lo, 1e-12)), kind="stable"
    )
    per = -(-t // n_shards)
    pad = per * n_shards - t
    idx_sorted = idx[order]
    mat_sorted = np.asarray(tris.material_id)[order]
    if pad:
        idx_sorted = np.concatenate(
            [idx_sorted, np.zeros((pad, 3), np.int64)]
        )
        mat_sorted = np.concatenate(
            [mat_sorted, np.zeros((pad,), mat_sorted.dtype)]
        )
    # Degenerate padding: all three vertices identical -> det == 0.
    new_tris = Triangles(
        verts=tris.verts,
        idx=jnp.asarray(idx_sorted, jnp.int32),
        uv=tris.uv,
        material_id=jnp.asarray(mat_sorted, jnp.int32),
    )
    return scene.replace(triangles=new_tris)


def _local_hit(o: Array, d: Array, scene: Scene, shard: Array, per: int) -> Hit:
    """Brute-force closest hit over this shard's triangle rows + all
    spheres (spheres are tiny and stay replicated)."""
    from blink.kernels.bruteforce import intersect_brute

    tris = scene.triangles
    row0 = shard * per
    sub = Triangles(
        verts=tris.verts,
        idx=jax.lax.dynamic_slice_in_dim(tris.idx, row0, per, axis=0),
        uv=tris.uv,
        material_id=jax.lax.dynamic_slice_in_dim(
            tris.material_id, row0, per, axis=0
        ),
    )
    local = scene.replace(triangles=sub)
    hit = intersect_brute(o, d, local)
    # Re-base local tri ids to global rows.
    prim = jnp.where(hit.kind == KIND_TRI, hit.prim + row0, hit.prim)
    return Hit(t=hit.t, kind=hit.kind, prim=prim)


def intersect_scene_sharded(o: Array, d: Array, scene: Scene, mesh=None) -> Hit:
    """Closest hit with the TRIANGLE SET sharded over the mesh and rays
    replicated. scene must come from shard_scene_triangles(mesh size)."""
    mesh = mesh or make_mesh()
    n = mesh.devices.size
    per = scene.triangles.idx.shape[0] // n

    def shard_fn(o, d, scene):
        i = jax.lax.axis_index(AXIS)
        hit = _local_hit(o, d, scene, i, per)
        # Combine across shards with collectives (their outputs are
        # inferably replicated, which out_specs=P() requires):
        #   global t = pmin; winner identity = pmin over a packed
        #   (kind, prim) code restricted to shards achieving the min t
        #   (ties resolve to the smallest code — deterministic, and
        #   consistent with intersect_brute's sphere-first tie rule).
        t_min = jax.lax.pmin(hit.t, AXIS)
        code = (hit.kind << 28) | hit.prim
        code = jnp.where(hit.t <= t_min, code, jnp.int32(2**30))
        code_min = jax.lax.pmin(code, AXIS)
        kind = jnp.where(code_min < 2**30, code_min >> 28, KIND_NONE)
        prim = jnp.where(code_min < 2**30, code_min & ((1 << 28) - 1), 0)
        return Hit(t=t_min, kind=kind, prim=prim)

    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P()
    )
    return jax.jit(fn)(o, d, scene)


def _pad_flat(bvh, n_nodes: int, n_slots: int):
    """Pad a FlatBVH to uniform (n_nodes, n_slots) so chunks stack.

    Padding nodes are EMPTY_BOX with skip == n_nodes: a stray visit fails
    its slab test and terminates. Padding tri slots are degenerate
    (det == 0) with tri_id == -1."""
    from blink.bvh.build import EMPTY_BOX

    n = bvh.n_nodes
    p = bvh.tri_id.shape[0]
    assert n <= n_nodes and p <= n_slots, (n, n_nodes, p, n_slots)
    pad_n = n_nodes - n
    pad_p = n_slots - p

    def padf(a, k, fill):
        return jnp.concatenate(
            [a, jnp.full((k,) + a.shape[1:], fill, a.dtype)]
        ) if k else a

    return bvh.replace(
        lo=padf(bvh.lo, pad_n, EMPTY_BOX),
        hi=padf(bvh.hi, pad_n, EMPTY_BOX),
        skip=padf(bvh.skip, pad_n, n_nodes),
        first=padf(bvh.first, pad_n, 0),
        count=padf(bvh.count, pad_n, 0),
        tv0=padf(bvh.tv0, pad_p, 0.0),
        te1=padf(bvh.te1, pad_p, 0.0),
        te2=padf(bvh.te2, pad_p, 0.0),
        tri_id=padf(bvh.tri_id, pad_p, -1),
    )


@jax.tree_util.register_static
class _ChunkMeta:
    def __init__(self, n_nodes, leaf_size, per_shard):
        self.n_nodes = n_nodes
        self.leaf_size = leaf_size
        self.per_shard = per_shard


def build_sharded_chunks(
    tris, n_shards: int, leaf_size: int = 16, chunk_tris: int | None = None
):
    """Stacked, uniformly-padded BVHPacked chunks for BVH traversal with
    the TRIANGLE SET sharded over the mesh (VERDICT r1 #6: the beyond-HBM
    scenario needs a real traversal under the shard, not brute force).

    Chunks are the same Morton ranges the chunked Pallas path uses
    (kernels.traverse_pallas._chunked_sah_trees) with GLOBAL tri ids, so
    the sharded result is exactly the replicated result. Returns
    ((nrow, trow) stacked with leading chunk axis, meta); the chunk count
    is padded to a multiple of n_shards with empty chunks.
    """
    from blink.bvh.build import EMPTY_BOX
    from blink.bvh.types import FlatBVH
    from blink.kernels.traverse_pallas import (
        CHUNK_TRIS,
        _chunked_sah_trees,
        pack_bvh_planes,
    )

    if chunk_tris is None:
        t = int(np.asarray(tris.idx).shape[0])
        # One chunk per shard when it fits VMEM; else more chunks/shard.
        chunk_tris = min(CHUNK_TRIS, -(-t // n_shards))
    trees = _chunked_sah_trees(tris, leaf_size, chunk_tris)
    n_chunks = -(-len(trees) // n_shards) * n_shards
    empty = FlatBVH(
        lo=jnp.full((1, 3), EMPTY_BOX, jnp.float32),
        hi=jnp.full((1, 3), EMPTY_BOX, jnp.float32),
        skip=jnp.ones((1,), jnp.int32),
        first=jnp.zeros((1,), jnp.int32),
        count=jnp.zeros((1,), jnp.int32),
        tv0=jnp.zeros((1, 3), jnp.float32),
        te1=jnp.zeros((1, 3), jnp.float32),
        te2=jnp.zeros((1, 3), jnp.float32),
        tri_id=jnp.full((1,), -1, jnp.int32),
        heap2pre=None,
        leaf_size=leaf_size,
    )
    trees = trees + [empty] * (n_chunks - len(trees))
    n_nodes = max(b.n_nodes for b in trees)
    n_slots = max(b.tri_id.shape[0] for b in trees)
    packed = [pack_bvh_planes(_pad_flat(b, n_nodes, n_slots)) for b in trees]
    nrow = jnp.stack([p.nrow for p in packed])  # (C, R, 128)
    trow = jnp.stack([p.trow for p in packed])  # (C, Pr, 128)
    meta = _ChunkMeta(
        n_nodes=packed[0].n_nodes,
        leaf_size=leaf_size,
        per_shard=n_chunks // n_shards,
    )
    return (nrow, trow), meta


def intersect_chunks_sharded(
    o: Array, d: Array, stacked, meta, mesh=None, interpret=None
):
    """Closest hit over triangle chunks SHARDED across the mesh (rays
    replicated): each device walks only its own chunks' BVHs with the
    production packet kernel, then winners combine with pmin collectives —
    exact (min over a partition == global min). Returns (t, prim)."""
    from blink.kernels.traverse_pallas import BVHPacked, _traverse_pallas

    mesh = mesh or make_mesh()
    nrow, trow = stacked

    def shard_fn(o, d, nrow, trow):
        n = o.shape[0]
        vary = (o[:, 0] + d[:, 0]) * 0  # carry absorbs mesh-varying type
        best_t = jnp.full((n,), T_MAX, jnp.float32) + vary
        best_prim = jnp.full((n,), -1, jnp.int32) + vary.astype(jnp.int32)
        for i in range(meta.per_shard):
            packed = BVHPacked(
                nrow=nrow[i],
                trow=trow[i],
                n_nodes=meta.n_nodes,
                leaf_size=meta.leaf_size,
            )
            t, prim = _traverse_pallas(
                o, d, best_t, packed, any_hit=False, interpret=interpret,
                variant="ordered_rg",
            )
            better = prim >= 0
            best_t = jnp.where(better, t, best_t)
            best_prim = jnp.where(better, prim, best_prim)
        # Tie-break exactly like the replicated traverse_closest_chunked
        # reference: chunks are assigned to shards in CONTIGUOUS ASCENDING
        # order and the per-shard loop only replaces on strict improvement,
        # so "earliest chunk wins" == "lowest shard index among t-ties,
        # then that shard's (unique) hit". A min-prim tie-break would
        # diverge from the reference on coincident duplicate triangles
        # straddling a chunk boundary (ADVICE r2).
        t_min = jax.lax.pmin(best_t, AXIS)
        tied = (best_prim >= 0) & (best_t <= t_min)
        big = jnp.int32(2**30)
        sidx = jax.lax.axis_index(AXIS)
        s_min = jax.lax.pmin(jnp.where(tied, sidx, big), AXIS)
        pcode = jnp.where(tied & (sidx == s_min), best_prim, big)
        code_min = jax.lax.pmin(pcode, AXIS)
        prim = jnp.where(code_min < big, code_min, -1)
        return t_min, prim

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)(o, d, nrow, trow)


def occluded_chunks_sharded(
    o: Array, d: Array, stacked, meta, t_far: Array, mesh=None, interpret=None
):
    """Any-hit over sharded chunks: boolean OR all-reduce across shards."""
    from blink.kernels.traverse_pallas import BVHPacked, _traverse_pallas

    mesh = mesh or make_mesh()
    nrow, trow = stacked

    def shard_fn(o, d, nrow, trow, t_far):
        vary = (o[:, 0] + d[:, 0] + t_far) * 0
        blocked = vary > 0.0  # all-False, mesh-varying
        for i in range(meta.per_shard):
            packed = BVHPacked(
                nrow=nrow[i],
                trow=trow[i],
                n_nodes=meta.n_nodes,
                leaf_size=meta.leaf_size,
            )
            tf = jnp.where(blocked, 0.0, t_far)
            _, prim = _traverse_pallas(
                o, d, tf, packed, any_hit=True, interpret=interpret,
            )
            blocked = blocked | (prim >= 0)
        return jax.lax.psum(blocked.astype(jnp.int32), AXIS) > 0

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P()),
        out_specs=P(),
    )
    return jax.jit(fn)(o, d, nrow, trow, t_far)


def occluded_scene_sharded(
    o: Array, d: Array, scene: Scene, t_far: Array, mesh=None
) -> Array:
    """Any-hit with sharded triangles: boolean OR all-reduce over shards."""
    from blink.kernels.bruteforce import occluded_brute

    mesh = mesh or make_mesh()
    n = mesh.devices.size
    per = scene.triangles.idx.shape[0] // n

    def shard_fn(o, d, scene, t_far):
        i = jax.lax.axis_index(AXIS)
        row0 = i * per
        tris = scene.triangles
        sub = Triangles(
            verts=tris.verts,
            idx=jax.lax.dynamic_slice_in_dim(tris.idx, row0, per, axis=0),
            uv=tris.uv,
            material_id=jax.lax.dynamic_slice_in_dim(
                tris.material_id, row0, per, axis=0
            ),
        )
        local = scene.replace(triangles=sub)
        # Spheres only counted once (shard 0) to keep the psum honest for
        # a hypothetical count-based variant; for OR it is harmless either
        # way — keep all shards testing spheres for simplicity.
        blocked = occluded_brute(o, d, local, t_far)
        return jax.lax.psum(blocked.astype(jnp.int32), AXIS) > 0

    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P()
    )
    return jax.jit(fn)(o, d, scene, t_far)

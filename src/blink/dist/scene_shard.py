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

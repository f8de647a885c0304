"""Stackless BVH traversal — pure-JAX reference implementation
(SURVEY.md §2 "Stackless BVH traversal kernel"; BASELINE.json:5).

Per-ray skip-link walk (uniform rule `node = hit ? node+1 : skip[node]`,
see bvh.types) as a lax.while_loop, vmapped over rays. This is the
correctness fallback and CPU path; the Pallas TPU kernels
(kernels.traverse_pallas) implement the same walk packet-wise and are
parity-tested against this module.

Traversal is a topology oracle: outputs are integers (+ a float t used
only for ordering, stop_gradient'ed); all differentiable geometry is
re-derived by diff.hitrefine (SURVEY.md §3.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.bvh.types import FlatBVH
from blink.core.aabb import ray_aabb
from blink.kernels.sphere import sphere_t
from blink.kernels.triangle import triangle_t
from blink.kernels.types import Hit, KIND_NONE, KIND_SPHERE, KIND_TRI, T_MAX, T_MIN
from blink.scene.scene import Scene

Array = jnp.ndarray


def _walk_one(o: Array, d: Array, bvh: FlatBVH, t_min, t_far, any_hit: bool):
    """Single-ray stackless walk. Returns (best_t, best_prim)."""
    inv_d = 1.0 / d  # exact: +-inf for parallel axes (see core.aabb)
    n_nodes = bvh.n_nodes
    K = bvh.leaf_size

    def cond(state):
        node, best_t, best_prim = state
        running = node < n_nodes
        if any_hit:
            running = running & (best_prim < 0)
        return running

    def body(state):
        node, best_t, best_prim = state
        hit_box = ray_aabb(o, inv_d, t_min, best_t, bvh.lo[node], bvh.hi[node])
        cnt = bvh.count[node]
        fst = bvh.first[node]
        leaf_hit = hit_box & (cnt > 0)
        # Unrolled leaf test: K is small and static; padded slots have
        # degenerate (det==0) triangles and tri_id == -1.
        for j in range(K):
            idx = fst + j
            t = triangle_t(
                o, d, bvh.tv0[idx], bvh.te1[idx], bvh.te2[idx], t_min, best_t
            )
            better = leaf_hit & (j < cnt) & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_prim = jnp.where(better, bvh.tri_id[idx], best_prim)
        node = jnp.where(hit_box, node + 1, bvh.skip[node])
        return node, best_t, best_prim

    # f32 normally; f64 under FD-validation runs (dtype follows inputs).
    dt = jnp.result_type(o.dtype, d.dtype, bvh.tv0.dtype)
    t0 = jnp.minimum(jnp.asarray(t_far, dt), jnp.asarray(T_MAX, dt))
    # Derive carries from ALL data inputs so their varying-manual-axes
    # type matches the loop outputs inside jax.shard_map regions (any of
    # o, d, t_far may carry the mesh-varying type; fresh constants would
    # be rejected by the carry check).
    vary_f = (o[0] + d[0]) * 0 + t0 * 0
    vary_i = vary_f.astype(jnp.int32)
    state = (jnp.int32(0) + vary_i, t0 + vary_f, jnp.int32(-1) + vary_i)
    _, best_t, best_prim = jax.lax.while_loop(cond, body, state)
    return best_t, best_prim


def traverse_closest(o: Array, d: Array, bvh: FlatBVH, t_min=T_MIN):
    """Closest-hit walk for a ray batch: (t (N,), prim (N,)); prim -1 miss."""
    return jax.vmap(
        lambda oo, dd: _walk_one(oo, dd, bvh, t_min, T_MAX, any_hit=False)
    )(o, d)


def traverse_anyhit(o: Array, d: Array, bvh: FlatBVH, t_far: Array, t_min=T_MIN):
    """Any-hit (shadow) walk: True where a hit exists in (t_min, t_far)."""
    _, prim = jax.vmap(
        lambda oo, dd, tf: _walk_one(oo, dd, bvh, t_min, tf, any_hit=True)
    )(o, d, t_far)
    return prim >= 0


def _sphere_pass(o: Array, d: Array, scene: Scene, t_min, t_max: Array,
                 use_pallas: bool = False):
    """Analytic sphere pass (spec scenes have <= 8 spheres): the packet
    Pallas kernel on the pallas backend, the vmapped jnp form elsewhere
    (CPU, f64 FD runs, and sphere counts past the kernel's unroll bound).
    Both produce the same winner under the caller's strict `< t_max`
    combine (tests/test_intersect.py parity)."""
    from blink.kernels.sphere import MAX_PALLAS_SPHERES, sphere_pass_pallas

    if use_pallas and scene.n_spheres <= MAX_PALLAS_SPHERES:
        return sphere_pass_pallas(
            o, d, scene.spheres.center, scene.spheres.radius, t_max,
            t_min=t_min,
        )
    ts = jax.vmap(
        lambda oo, dd, tm: sphere_t(
            oo, dd, scene.spheres.center, scene.spheres.radius, t_min, tm
        )
    )(o, d, t_max)  # (N, S)
    prim = jnp.argmin(ts, axis=-1)
    return jnp.min(ts, axis=-1), jnp.asarray(prim, jnp.int32)


def intersect_bvh(
    o: Array, d: Array, scene: Scene, bvh: FlatBVH, use_pallas: bool = False,
    alive: Array | None = None,
) -> Hit:
    """Closest hit over triangle BVH + analytic spheres.

    `alive` (optional bool mask): lanes marked dead report a miss. On the
    Pallas backend dead lanes also SKIP the walk (t_far=0 fails every slab
    test; compaction-sunk dead tails skip whole cull groups) — the bounce-
    wavefront cull of render.integrators.li_path. All backends return the
    identical Hit for dead lanes (t=T_MAX, kind=NONE), so parity suites
    cover the masked form unchanged."""
    if use_pallas:
        from blink.kernels.traverse_pallas import traverse_closest_chunked

        tf = None
        if alive is not None:
            tf = jnp.where(alive, T_MAX, 0.0).astype(jnp.float32)
        tri_t, tri_prim = traverse_closest_chunked(
            o, d, bvh if isinstance(bvh, list) else [bvh], t_far=tf
        )
    else:
        tri_t, tri_prim = traverse_closest(o, d, bvh)
        if alive is not None:
            tri_prim = jnp.where(alive, tri_prim, -1)
    n = o.shape[0]
    best_t = tri_t
    kind = jnp.where(tri_prim >= 0, KIND_TRI, KIND_NONE).astype(jnp.int32)
    prim = jnp.maximum(tri_prim, 0)
    if scene.n_spheres > 0:
        if alive is not None:
            # Dead lanes must not pick up sphere hits (pallas threads
            # t_far=0 so its sphere t_max is already 0; mirror that here).
            best_t = jnp.where(alive, best_t, 0.0)
        s_t, s_prim = _sphere_pass(o, d, scene, T_MIN, best_t,
                                   use_pallas=use_pallas)
        s_better = s_t < best_t
        best_t = jnp.where(s_better, s_t, best_t)
        kind = jnp.where(s_better, KIND_SPHERE, kind)
        prim = jnp.where(s_better, s_prim, prim)
    if alive is not None:
        # Canonical dead-lane Hit, identical across backends/paths.
        best_t = jnp.where(alive, best_t, T_MAX)
        kind = jnp.where(alive, kind, KIND_NONE)
        prim = jnp.where(alive, prim, 0)
    return Hit(
        t=jax.lax.stop_gradient(best_t),
        kind=kind,
        prim=prim,
    )


def occluded_bvh(
    o: Array,
    d: Array,
    scene: Scene,
    bvh: FlatBVH,
    t_far: Array,
    use_pallas: bool = False,
) -> Array:
    """Any-hit occlusion over triangle BVH + analytic spheres."""
    t_far = jax.lax.stop_gradient(t_far)
    if use_pallas:
        from blink.kernels.traverse_pallas import traverse_anyhit_chunked

        blocked = traverse_anyhit_chunked(
            o, d, bvh if isinstance(bvh, list) else [bvh], t_far
        )
    else:
        blocked = traverse_anyhit(o, d, bvh, t_far)
    if scene.n_spheres > 0:
        s_t, _ = _sphere_pass(o, d, scene, T_MIN, t_far,
                              use_pallas=use_pallas)
        blocked = blocked | (s_t < t_far)
    return jax.lax.stop_gradient(blocked)

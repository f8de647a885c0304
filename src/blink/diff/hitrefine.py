"""Differentiable hit refinement at fixed topology.

This is the heart of the differentiation design (SURVEY.md §3.2,
BASELINE.json:5 "custom VJPs through the intersection ... gradients back
through hit records"): traversal returns integer topology (kind, prim); this
module re-derives every geometric quantity (t, point, normal, uv) in closed
form from (ray, prim, scene-params) so plain JAX autodiff produces exact
geometry/camera gradients at fixed hit topology.

Data-movement design (measured on the axon v5e — see core.rows and
benchmarks/dispatch_probe.py): per-hit triangle attributes come from ONE
16-wide row gather of the packed shade table (scene.shade) instead of ~10
narrow gathers; material and sphere attributes come from branchless
where-sweeps over their small tables (pure elementwise, zero gathers).
The backward pass turns the single wide gather into a single segment-sum
scatter over triangles (when the table is built differentiably in-jit) and
the sweeps into per-row masked reductions.

Both primitive hypotheses (sphere and triangle) are evaluated branchlessly
and selected by `kind` — no data-dependent control flow under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.core import vec
from blink.core.rows import select_rows
from blink.core.struct import pytree_dataclass
from blink.kernels.sphere import sphere_t
from blink.kernels.triangle import triangle_tuv
from blink.kernels.types import Hit, KIND_SPHERE, KIND_TRI, T_MAX, T_MIN
from blink.scene.scene import Scene
from blink.scene.textures import sample_texture

Array = jnp.ndarray


@pytree_dataclass
class HitGeom:
    """Differentiable per-ray shading geometry. All shapes (N, ...)."""

    valid: Array  # (N,) bool — ray hit something
    t: Array  # (N,) differentiable hit distance (T_MAX on miss)
    p: Array  # (N,3) hit point
    n: Array  # (N,3) unit normal, flipped to face the incoming ray
    uv: Array  # (N,2) texture coordinates
    mat: Array  # (N,) i32 material id
    albedo: Array  # (N,3) textured albedo
    emission: Array  # (N,3) emitted radiance (two-sided)


def material_table(scene: Scene) -> Array:
    """(M, 7) packed material rows [albedo(3), emission(3), tex_id(1)] —
    built in-jit (elementwise concat, effectively free) so sweeps stay
    differentiable w.r.t. albedo/emission."""
    m = scene.materials
    return jnp.concatenate(
        [m.albedo, m.emission, m.texture_id.astype(m.albedo.dtype)[:, None]],
        axis=1,
    )


@jax.custom_vjp
def _gather_tri_verts(verts: Array, i: Array):
    """Fetch the 3 vertex rows of each hit triangle: (V,3),(N,3)i32 ->
    3x(N,3).

    Forward is the plain triple gather. The custom VJP exists for the
    BACKWARD: plain AD transposes each gather separately — three
    (N,3)->(V,3) scatter-adds, each paying the full TPU scatter cost
    (measured ~24 ms per 262k-row scatter on the axon v5e,
    benchmarks/dispatch_probe.py). Here the three are batched into ONE
    segment_sum over the concatenated (3N,) index space: identical sums
    (scatter-add is order-independent), two fewer scatter launches
    (VERDICT r2 #4)."""
    return verts[i[:, 0]], verts[i[:, 1]], verts[i[:, 2]]


def _gather_tri_verts_fwd(verts, i):
    return _gather_tri_verts(verts, i), (i, verts.shape[0])


def _gather_tri_verts_bwd(res, g):
    i, n_verts = res
    idx = jnp.concatenate([i[:, 0], i[:, 1], i[:, 2]])
    val = jnp.concatenate([g[0], g[1], g[2]], axis=0)
    # Per-COMPONENT scalar segment_sums: a (3N,3)->(V,3) scatter-add
    # lowers ~3x slower than three (3N,)->(V,) scalar ones on this chip
    # (benchmarks/segsum_probe.py, 1024², realistic hit indices:
    # 270 ms vs 87 ms) — the trailing dim defeats the TPU scatter
    # lowering's vectorization.
    outs = [
        jax.ops.segment_sum(val[:, c], idx, num_segments=n_verts)
        for c in range(3)
    ]
    return jnp.stack(outs, axis=-1), None


_gather_tri_verts.defvjp(_gather_tri_verts_fwd, _gather_tri_verts_bwd)


def refine(
    o: Array, d: Array, hit: Hit, scene: Scene, shade: Array | None = None
) -> HitGeom:
    """Re-derive differentiable geometry from integer topology.

    o, d: (N,3) rays. hit: topology from any traversal backend. shade: the
    (T,16) packed triangle table (scene.shade) — precomputed by the
    backend for STATIC geometry (one wide row gather per refine, the fast
    forward path). None = differentiable-geometry mode: triangle
    attributes are fetched with per-ray narrow gathers from the live
    vertex arrays instead. That is slower forward (~5 narrow N-row
    gathers) but its autodiff transpose is 3 small (N,3)->(V,3)
    scatter-adds — building a (T,16) table in-jit would transpose into
    T-row scatters (T can be ~1M >> N) plus vertex scatters, several
    times the cost. The result is exact for the primitive the traversal
    selected; misses produce zeroed fields with valid=False.
    """
    n_rays = o.shape[0]
    prim = jax.lax.stop_gradient(hit.prim)
    kind = jax.lax.stop_gradient(hit.kind)
    is_s = kind == KIND_SPHERE
    is_t = kind == KIND_TRI
    valid = is_s | is_t

    t = jnp.full((n_rays,), T_MAX, jnp.float32)
    nrm = jnp.zeros((n_rays, 3), jnp.float32)
    uv = jnp.zeros((n_rays, 2), jnp.float32)
    mat = jnp.zeros((n_rays,), jnp.int32)

    if scene.n_spheres > 0:
        sp = jnp.clip(prim, 0, scene.n_spheres - 1)
        # Sphere attrs via where-sweep (spec scenes have <= ~8 spheres).
        sph = scene.spheres
        stab = jnp.concatenate(
            [
                sph.center,
                sph.radius[:, None],
                sph.material_id.astype(sph.center.dtype)[:, None],
            ],
            axis=1,
        )
        srow = select_rows(stab, sp)
        c = srow[:, 0:3]
        r = srow[:, 3]
        ts = sphere_t(o, d, c, r, T_MIN)  # same root-selection as forward
        ps = o + ts[..., None] * d
        ns = (ps - c) / jnp.maximum(r, vec.EPS)[..., None]
        # Spherical uv (matches builders.icosphere parameterization).
        us = 0.5 + jnp.arctan2(ns[..., 2], ns[..., 0]) / (2.0 * jnp.pi)
        vs = 0.5 + jnp.arcsin(jnp.clip(ns[..., 1], -1.0, 1.0)) / jnp.pi
        t = jnp.where(is_s, ts, t)
        nrm = jnp.where(is_s[..., None], ns, nrm)
        uv = jnp.where(is_s[..., None], jnp.stack([us, vs], -1), uv)
        mat = jnp.where(is_s, srow[:, 4].astype(jnp.int32), mat)

    if scene.n_triangles > 0:
        tp = jnp.clip(prim, 0, scene.n_triangles - 1)
        # Hybrid dirty mode (round-5, bwd_probe3/4: the all-narrow-gather
        # dirty path cost +80 ms at 1024²): uv and material ids NEVER
        # change under parameter merges (no param writes them), so even
        # with dirty geometry they can come from the precomputed f32
        # table in ONE wide gather; only v0/e1/e2 must be re-gathered
        # from the live vertex array (the differentiable path). f64 FD
        # configs skip the hybrid — the f32 table would truncate uv.
        hybrid = (
            shade is not None
            and scene.geom_dirty
            and scene.triangles.verts.dtype == jnp.float32
        )
        if shade is not None and not scene.geom_dirty:
            row = shade[tp]  # ONE wide gather for all triangle attributes
            v0 = row[:, 0:3]
            e1 = row[:, 3:6]
            e2 = row[:, 6:9]
            uv0, duv1, duv2 = row[:, 9:11], row[:, 11:13], row[:, 13:15]
            mat_t = row[:, 15].astype(jnp.int32)
        elif hybrid:
            row = shade[tp]
            uv0, duv1, duv2 = row[:, 9:11], row[:, 11:13], row[:, 13:15]
            mat_t = row[:, 15].astype(jnp.int32)
            tris = scene.triangles
            i = jax.lax.stop_gradient(tris.idx[tp])
            v0, v1, v2 = _gather_tri_verts(tris.verts, i)
            e1 = v1 - v0
            e2 = v2 - v0
        else:
            # Differentiable-geometry mode: narrow per-ray gathers from
            # the live arrays (backward = 3 (N,3)->(V,3) scatters).
            tris = scene.triangles
            i = jax.lax.stop_gradient(tris.idx[tp])
            v0, v1, v2 = _gather_tri_verts(tris.verts, i)
            e1 = v1 - v0
            e2 = v2 - v0
            uv0 = tris.uv[i[:, 0]]
            duv1 = tris.uv[i[:, 1]] - uv0
            duv2 = tris.uv[i[:, 2]] - uv0
            mat_t = tris.material_id[tp]
        tt, bu, bv = triangle_tuv(o, d, v0, e1, e2, T_MIN)
        ng = vec.normalize(vec.cross(e1, e2))
        uv_tri = uv0 + bu[..., None] * duv1 + bv[..., None] * duv2
        t = jnp.where(is_t, tt, t)
        nrm = jnp.where(is_t[..., None], ng, nrm)
        uv = jnp.where(is_t[..., None], uv_tri, uv)
        mat = jnp.where(is_t, mat_t, mat)

    # Guard: if refinement disagrees with traversal (measure-zero edge),
    # treat as miss rather than produce garbage gradients.
    valid = valid & (t < T_MAX)
    t_safe = jnp.where(valid, t, 0.0)
    p = o + t_safe[..., None] * d
    # Face the normal against the incoming direction (two-sided shading).
    flip = jnp.where(vec.vdot(nrm, d) > 0.0, -1.0, 1.0)
    nrm = nrm * flip[..., None]

    mrow = select_rows(material_table(scene), mat)
    albedo = mrow[:, 0:3]
    tex = sample_texture(
        scene.textures, mrow[:, 6].astype(jnp.int32), uv
    )
    albedo = albedo * tex
    emission = mrow[:, 3:6]
    vmask = valid[..., None]
    return HitGeom(
        valid=valid,
        t=jnp.where(valid, t, T_MAX),
        p=jnp.where(vmask, p, 0.0),
        n=jnp.where(vmask, nrm, 0.0),
        uv=jnp.where(vmask, uv, 0.0),
        mat=jnp.where(valid, mat, 0),
        albedo=jnp.where(vmask, albedo, 0.0),
        emission=jnp.where(vmask, emission, 0.0),
    )

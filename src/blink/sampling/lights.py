"""Next-event-estimation light sampling (SURVEY.md §2 "Sampling";
BASELINE.json:8 "direct lighting + shadow rays").

Samples a point on an emissive primitive (triangle or sphere) with its area
pdf. Fully differentiable w.r.t. light geometry (vertex positions, sphere
center/radius) and — through the caller — emission.

Data-movement design (core.rows): per-light attributes are packed into an
(L, 16) table built in-jit (only L-row gathers — L is the light count, a
handful of elements) and then selected per ray with a branchless
where-sweep. The previous form gathered light vertices per RAY from the
full (possibly million-row) vertex table — ~12 narrow N-row gathers per
NEE sample at ~3 ms each on this chip.

Light-row layout (LIGHT_COLS = 16):
  0:3   a0    tri v0            | sphere center
  3:6   a1    tri v1            | sphere (radius, 0, 0)
  6:9   a2    tri v2            | unused
  9:12  n     tri unit normal   | unused (sphere normal is per-ray)
  12    pdf_area (1/area | 1/(4 pi r^2))
  13    kind (LIGHT_TRI | LIGHT_SPHERE)
  14    material id
  15    pad
"""
from __future__ import annotations

import jax.numpy as jnp

from blink.core import vec
from blink.core.rows import select_rows
from blink.scene.scene import LIGHT_SPHERE, Scene

Array = jnp.ndarray

LIGHT_COLS = 16


def pack_light_rows(scene: Scene) -> Array:
    """(L, 16) packed light table; differentiable w.r.t. light geometry.

    Built from L-row gathers of the scene arrays (L = #lights, tiny), so
    it costs nothing and can be rebuilt per NEE call without hoisting.
    """
    lights = scene.lights
    l = lights.kind.shape[0]
    if l == 0:
        return jnp.zeros((0, LIGHT_COLS), jnp.float32)
    kind = lights.kind
    prim = lights.prim
    a0 = jnp.zeros((l, 3), jnp.float32)
    a1 = jnp.zeros((l, 3), jnp.float32)
    a2 = jnp.zeros((l, 3), jnp.float32)
    n_l = jnp.zeros((l, 3), jnp.float32)
    pdf = jnp.ones((l,), jnp.float32)
    mat = jnp.zeros((l,), jnp.int32)

    if scene.n_triangles > 0:
        tris = scene.triangles
        tp = jnp.clip(prim, 0, scene.n_triangles - 1)
        i = tris.idx[tp]
        v0 = tris.verts[i[:, 0]]
        v1 = tris.verts[i[:, 1]]
        v2 = tris.verts[i[:, 2]]
        c = vec.cross(v1 - v0, v2 - v0)
        twice_area = vec.length(c)
        nt = c / jnp.maximum(twice_area, vec.EPS)[..., None]
        pdf_t = 2.0 / jnp.maximum(twice_area, vec.EPS)  # 1/area
        is_t = (kind != LIGHT_SPHERE)[:, None]
        a0 = jnp.where(is_t, v0, a0)
        a1 = jnp.where(is_t, v1, a1)
        a2 = jnp.where(is_t, v2, a2)
        n_l = jnp.where(is_t, nt, n_l)
        pdf = jnp.where(kind != LIGHT_SPHERE, pdf_t, pdf)
        mat = jnp.where(
            kind != LIGHT_SPHERE, tris.material_id[tp], mat
        )

    if scene.n_spheres > 0:
        sp = jnp.clip(prim, 0, scene.n_spheres - 1)
        c = scene.spheres.center[sp]
        r = scene.spheres.radius[sp]
        pdf_s = 1.0 / (4.0 * jnp.pi * jnp.maximum(r * r, vec.EPS))
        is_s = (kind == LIGHT_SPHERE)[:, None]
        a0 = jnp.where(is_s, c, a0)
        a1 = jnp.where(
            is_s,
            jnp.concatenate([r[:, None], jnp.zeros((l, 2), r.dtype)], 1),
            a1,
        )
        pdf = jnp.where(kind == LIGHT_SPHERE, pdf_s, pdf)
        mat = jnp.where(
            kind == LIGHT_SPHERE, scene.spheres.material_id[sp], mat
        )

    dt = a0.dtype
    return jnp.concatenate(
        [
            a0,
            a1,
            a2,
            n_l,
            pdf[:, None].astype(dt),
            kind.astype(dt)[:, None],
            mat.astype(dt)[:, None],
            jnp.zeros((l, 1), dt),
        ],
        axis=1,
    )


def sample_light_point(
    scene: Scene,
    light: Array,
    u1: Array,
    u2: Array,
    rows: Array | None = None,
):
    """Sample a point on light index `light` (all args broadcast, (N,)).

    rows: optional precomputed pack_light_rows(scene) (hoisted by callers
    that sample repeatedly). Returns (p, n_l, pdf_area, mat_id):
      p (N,3) point on the light surface,
      n_l (N,3) unit surface normal there,
      pdf_area (N,) area-measure pdf of the sample,
      mat_id (N,) i32 material of the light primitive.
    """
    if rows is None:
        rows = pack_light_rows(scene)
    row = select_rows(rows, light)  # where-sweep: zero per-ray gathers
    a0 = row[:, 0:3]
    a1 = row[:, 3:6]
    a2 = row[:, 6:9]
    is_s = row[:, 13] == float(LIGHT_SPHERE)
    mat = row[:, 14].astype(jnp.int32)
    pdf = row[:, 12]

    # Triangle hypothesis: sqrt-warp barycentric sample.
    su = jnp.sqrt(jnp.maximum(u1, 1e-12))
    b0 = 1.0 - su
    b1 = u2 * su
    pt = (
        b0[..., None] * a0
        + b1[..., None] * a1
        + (1.0 - b0 - b1)[..., None] * a2
    )
    nt = row[:, 9:12]

    # Sphere hypothesis: uniform area sample.
    z = 1.0 - 2.0 * u1
    phi = 2.0 * jnp.pi * u2
    s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    w = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
    ps = a0 + a1[:, 0:1] * w

    sel = is_s[..., None]
    p = jnp.where(sel, ps, pt)
    n_l = jnp.where(sel, w, nt)
    return p, n_l, pdf, mat

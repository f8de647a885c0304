"""Packed per-triangle shading-attribute table.

The hit-refinement pass (diff.hitrefine) needs, per hit triangle:
v0, e1, e2 (geometry), the three vertex uvs, and the material id. Fetched
naively that is ~10 narrow gathers per refine call; on this chip each
gather of N rows costs ~3 ms at 262k rays (benchmarks/dispatch_probe.py),
while ONE 16-wide row gather costs ~2x a narrow one. So the attributes are
packed once into a (T, 16) table and every refine pays a single gather.

Column layout (SHADE_COLS = 16):
  0:3   v0        triangle base vertex
  3:6   e1 = v1 - v0
  6:9   e2 = v2 - v0
  9:11  uv0
  11:13 duv1 = uv1 - uv0
  13:15 duv2 = uv2 - uv0
  15    material id (exact in f32 for ids < 2^24)

Two producers:
  - pack_tri_shade: jnp, differentiable — built INSIDE the jitted render
    when triangle vertices/uvs are themselves being optimized (gradients
    then flow: refine -> table rows -> scatter into verts, one scatter per
    FRAME instead of per refine call);
  - pack_tri_shade_np: numpy, host-side — precomputed once per scene by
    make_backend for the (common) static-geometry case, where the table
    enters jit as a plain non-differentiated array and the backward pass
    skips triangle-attribute scatters entirely.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from blink.scene.scene import Triangles

Array = jnp.ndarray

SHADE_COLS = 16


def pack_tri_shade(tris: Triangles) -> Array:
    """(T, 16) packed shading table; differentiable w.r.t. verts/uv."""
    t = tris.idx.shape[0]
    dt = tris.verts.dtype
    if t == 0:
        return jnp.zeros((0, SHADE_COLS), dt)
    i0 = tris.idx[:, 0]
    i1 = tris.idx[:, 1]
    i2 = tris.idx[:, 2]
    v0 = tris.verts[i0]
    e1 = tris.verts[i1] - v0
    e2 = tris.verts[i2] - v0
    uv0 = tris.uv[i0]
    duv1 = tris.uv[i1] - uv0
    duv2 = tris.uv[i2] - uv0
    mat = tris.material_id.astype(dt)[:, None]
    return jnp.concatenate([v0, e1, e2, uv0, duv1, duv2, mat], axis=1)


def pack_tri_shade_np(tris: Triangles) -> Array:
    """Host-side (numpy) pack of the same table — for make_backend."""
    idx = np.asarray(tris.idx)
    t = idx.shape[0]
    verts = np.asarray(tris.verts)
    dt = verts.dtype
    if t == 0:
        return jnp.zeros((0, SHADE_COLS), dt)
    uv = np.asarray(tris.uv)
    v0 = verts[idx[:, 0]]
    e1 = verts[idx[:, 1]] - v0
    e2 = verts[idx[:, 2]] - v0
    uv0 = uv[idx[:, 0]]
    duv1 = uv[idx[:, 1]] - uv0
    duv2 = uv[idx[:, 2]] - uv0
    mat = np.asarray(tris.material_id).astype(dt)[:, None]
    out = np.concatenate([v0, e1, e2, uv0, duv1, duv2, mat], axis=1)
    return jnp.asarray(out)

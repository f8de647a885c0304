"""Scene representation: SoA pytrees of analytic spheres, triangle meshes,
materials, lights, textures, and camera (SURVEY.md §2 "Scene pytree";
BASELINE.json:5 differentiation targets "geometry, materials, lights, and
camera" — every float array below is a differentiable leaf).

Quads (BASELINE.json:7) are represented as two triangles (builders.quad).
Counts are static shapes; a scene with no spheres simply has shape-(0,...)
arrays and the intersection layer branches statically on shape.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from blink.core.struct import pytree_dataclass, static_field
from blink.core import vec

Array = jnp.ndarray

# Light kinds
LIGHT_TRI = 0
LIGHT_SPHERE = 1


@pytree_dataclass
class Camera:
    """Pinhole camera. All fields differentiable (pose + fov)."""

    origin: Array  # (3,)
    look_at: Array  # (3,)
    up: Array  # (3,)
    fov_deg: Array  # () vertical field of view


@pytree_dataclass
class Spheres:
    center: Array  # (S, 3) f32
    radius: Array  # (S,)   f32
    material_id: Array  # (S,) i32


@pytree_dataclass
class Triangles:
    verts: Array  # (V, 3) f32
    idx: Array  # (T, 3) i32
    uv: Array  # (V, 2) f32 per-vertex texture coordinates
    material_id: Array  # (T,) i32


@pytree_dataclass
class Materials:
    albedo: Array  # (M, 3) f32 base color
    emission: Array  # (M, 3) f32 radiant exitance (0 for non-emitters)
    texture_id: Array  # (M,) i32, -1 = untextured


@pytree_dataclass
class Lights:
    """Explicit NEE light list referencing emissive primitives."""

    kind: Array  # (L,) i32 LIGHT_TRI | LIGHT_SPHERE
    prim: Array  # (L,) i32 index into triangles.idx or spheres.center


@pytree_dataclass
class Scene:
    spheres: Spheres
    triangles: Triangles
    materials: Materials
    lights: Lights
    textures: Array  # (K, R, R, 3) f32 texture atlas (K may be 0)
    camera: Camera
    #: Static flag set by api.merge_params whenever triangle geometry is
    #: swapped (e.g. optimizing tri_verts). Render paths then rebuild the
    #: packed shading table (scene.shade) in-jit from THIS scene instead
    #: of trusting a backend's precomputed cache — which would be stale
    #: AND would sever vertex gradients. Static (not a leaf): flipping it
    #: retraces, which is exactly the intent.
    geom_dirty: bool = static_field(default=False)

    @property
    def n_spheres(self) -> int:
        return self.spheres.radius.shape[0]

    @property
    def n_triangles(self) -> int:
        return self.triangles.idx.shape[0]

    @property
    def n_lights(self) -> int:
        return self.lights.kind.shape[0]


def empty_spheres() -> Spheres:
    return Spheres(
        center=jnp.zeros((0, 3), jnp.float32),
        radius=jnp.zeros((0,), jnp.float32),
        material_id=jnp.zeros((0,), jnp.int32),
    )


def empty_triangles() -> Triangles:
    return Triangles(
        verts=jnp.zeros((0, 3), jnp.float32),
        idx=jnp.zeros((0, 3), jnp.int32),
        uv=jnp.zeros((0, 2), jnp.float32),
        material_id=jnp.zeros((0,), jnp.int32),
    )


def make_scene(
    spheres: Spheres | None = None,
    triangles: Triangles | None = None,
    materials: Materials | None = None,
    lights: Lights | None = None,
    textures: Array | None = None,
    camera: Camera | None = None,
) -> Scene:
    if spheres is None:
        spheres = empty_spheres()
    if triangles is None:
        triangles = empty_triangles()
    if materials is None:
        materials = Materials(
            albedo=jnp.ones((1, 3), jnp.float32) * 0.8,
            emission=jnp.zeros((1, 3), jnp.float32),
            texture_id=-jnp.ones((1,), jnp.int32),
        )
    if lights is None:
        lights = Lights(
            kind=jnp.zeros((0,), jnp.int32), prim=jnp.zeros((0,), jnp.int32)
        )
    if textures is None:
        textures = jnp.zeros((0, 8, 8, 3), jnp.float32)
    if camera is None:
        camera = Camera(
            origin=jnp.array([0.0, 1.0, 3.0], jnp.float32),
            look_at=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            fov_deg=jnp.asarray(45.0, jnp.float32),
        )
    return Scene(
        spheres=spheres,
        triangles=triangles,
        materials=materials,
        lights=lights,
        textures=textures,
        camera=camera,
    )


def derive_lights(materials: Materials, spheres: Spheres, triangles: Triangles) -> Lights:
    """Build the NEE light list from emissive materials (host-side, numpy,
    vectorized — scenes have up to 10^6 primitives)."""
    em = np.asarray(materials.emission)
    is_emissive = em.sum(axis=-1) > 0.0
    tri_mat = np.asarray(triangles.material_id)
    sph_mat = np.asarray(spheres.material_id)
    tri_ids = np.nonzero(is_emissive[tri_mat])[0]
    sph_ids = np.nonzero(is_emissive[sph_mat])[0]
    kinds = np.concatenate(
        [
            np.full(tri_ids.shape, LIGHT_TRI, np.int32),
            np.full(sph_ids.shape, LIGHT_SPHERE, np.int32),
        ]
    )
    prims = np.concatenate([tri_ids, sph_ids]).astype(np.int32)
    return Lights(kind=jnp.asarray(kinds), prim=jnp.asarray(prims))


def triangle_vertices(tris: Triangles, prim: Array):
    """Gather (differentiably) the three vertices of triangle `prim`."""
    i = tris.idx[prim]  # (..., 3)
    v0 = tris.verts[i[..., 0]]
    v1 = tris.verts[i[..., 1]]
    v2 = tris.verts[i[..., 2]]
    return v0, v1, v2


def triangle_area_normal(tris: Triangles, prim: Array):
    """(area, unit geometric normal) of triangle `prim`, differentiable."""
    v0, v1, v2 = triangle_vertices(tris, prim)
    c = vec.cross(v1 - v0, v2 - v0)
    n2 = vec.length(c)
    area = 0.5 * n2
    n = c / jnp.maximum(n2, vec.EPS)[..., None]
    return area, n

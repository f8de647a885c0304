"""Procedural scene builders (host-side numpy; see SURVEY.md §4 "Fixtures":
the environment has no network, so bunny-class and Sponza-class assets are
synthesized — BASELINE.json:8,10 name scene *classes*, and the metric depends
on triangle count + BVH quality, not the exact asset).

Builders produce the five benchmark configurations of BASELINE.json:7-11:
  cornell_box      -> config 1 (8 spheres + 2 quads, Lambertian)
  bunny_scene      -> config 2 (~70k-tri mesh, direct lighting)
  cornell_box      -> config 3 reuses config 1 (inverse rendering target)
  sponza_scene     -> config 4 (~1M tris, textures, path tracing)
  sponza_scene     -> config 5 at 4096^2 x 64 spp multi-host
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blink.scene.scene import (
    Camera,
    Lights,
    Materials,
    Scene,
    Spheres,
    Triangles,
    derive_lights,
    make_scene,
)

F32 = np.float32
I32 = np.int32


class MeshBuilder:
    """Accumulates triangle soup + per-triangle materials (host-side)."""

    def __init__(self) -> None:
        self.verts: list[np.ndarray] = []
        self.uvs: list[np.ndarray] = []
        self.idx: list[np.ndarray] = []
        self.mat: list[np.ndarray] = []
        self._nv = 0

    def add_mesh(self, verts, faces, material_id, uv=None):
        verts = np.asarray(verts, F32).reshape(-1, 3)
        faces = np.asarray(faces, I32).reshape(-1, 3)
        if uv is None:
            uv = np.zeros((verts.shape[0], 2), F32)
        self.verts.append(verts)
        self.uvs.append(np.asarray(uv, F32).reshape(-1, 2))
        self.idx.append(faces + self._nv)
        self.mat.append(np.full((faces.shape[0],), material_id, I32))
        self._nv += verts.shape[0]

    def add_quad(self, p0, p1, p2, p3, material_id):
        """Quad p0..p3 (CCW) as two triangles with unit-square UVs."""
        verts = np.array([p0, p1, p2, p3], F32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], F32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], I32)
        self.add_mesh(verts, faces, material_id, uv)

    def build(self) -> Triangles:
        if not self.verts:
            from blink.scene.scene import empty_triangles

            return empty_triangles()
        return Triangles(
            verts=jnp.asarray(np.concatenate(self.verts)),
            idx=jnp.asarray(np.concatenate(self.idx)),
            uv=jnp.asarray(np.concatenate(self.uvs)),
            material_id=jnp.asarray(np.concatenate(self.mat)),
        )


def icosphere(subdiv: int, radius: float = 1.0, center=(0.0, 0.0, 0.0)):
    """Subdivided icosahedron: 20 * 4**subdiv triangles."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        F32,
    )
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        I32,
    )
    for _ in range(subdiv):
        # Vectorized midpoint subdivision: dedupe edges with np.unique so
        # shared midpoints get one vertex (watertight), no Python-per-face
        # loops (subdiv=6 is ~10^5 faces).
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        e_sorted = np.sort(e, axis=1)
        uniq, inv = np.unique(e_sorted, axis=0, return_inverse=True)
        mids = verts[uniq[:, 0]] + verts[uniq[:, 1]]
        mids /= np.linalg.norm(mids, axis=-1, keepdims=True)
        mid_idx = (len(verts) + inv).reshape(3, -1)  # [ab, bc, ca] per face
        ab, bc, ca = mid_idx[0], mid_idx[1], mid_idx[2]
        a, b, c = faces[:, 0], faces[:, 1], faces[:, 2]
        faces = np.concatenate(
            [
                np.stack([a, ab, ca], axis=1),
                np.stack([b, bc, ab], axis=1),
                np.stack([c, ca, bc], axis=1),
                np.stack([ab, bc, ca], axis=1),
            ]
        ).astype(I32)
        verts = np.concatenate([verts, mids.astype(F32)])
    verts = verts * radius + np.asarray(center, F32)
    # Spherical UVs for texture tests.
    d = verts - np.asarray(center, F32)
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    uv = np.stack(
        [0.5 + np.arctan2(d[:, 2], d[:, 0]) / (2 * np.pi), 0.5 + np.arcsin(np.clip(d[:, 1], -1, 1)) / np.pi],
        axis=-1,
    ).astype(F32)
    return verts, faces, uv


def box(lo, hi):
    """Axis-aligned box as 12 triangles with outward normals."""
    lo = np.asarray(lo, F32)
    hi = np.asarray(hi, F32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    v = np.array(
        [
            [x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
            [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1],
        ],
        F32,
    )
    f = np.array(
        [
            [4, 5, 6], [4, 6, 7],  # +z
            [1, 0, 3], [1, 3, 2],  # -z
            [5, 1, 2], [5, 2, 6],  # +x
            [0, 4, 7], [0, 7, 3],  # -x
            [3, 7, 6], [3, 6, 2],  # +y
            [0, 1, 5], [0, 5, 4],  # -y
        ],
        I32,
    )
    return v, f


def checker_texture(res: int = 64, tiles: int = 8, c0=(0.9, 0.9, 0.9), c1=(0.2, 0.3, 0.6)):
    ij = np.indices((res, res)).sum(axis=0) // (res // tiles)
    checker = (ij % 2).astype(F32)[..., None]
    return (np.asarray(c0, F32) * (1 - checker) + np.asarray(c1, F32) * checker).astype(F32)


def _camera(origin, look_at, fov=40.0) -> Camera:
    return Camera(
        origin=jnp.asarray(origin, jnp.float32),
        look_at=jnp.asarray(look_at, jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        fov_deg=jnp.asarray(fov, jnp.float32),
    )


def cornell_box() -> Scene:
    """Config 1 (BASELINE.json:7): 8 analytic spheres + 2 quads (floor +
    emissive ceiling panel), Lambertian, CPU-runnable oracle scene."""
    mats = Materials(
        albedo=jnp.asarray(
            np.array(
                [
                    [0.73, 0.73, 0.73],  # 0 floor
                    [0.00, 0.00, 0.00],  # 1 light (emission-only)
                    [0.65, 0.05, 0.05],  # 2
                    [0.12, 0.45, 0.15],  # 3
                    [0.05, 0.30, 0.65],  # 4
                    [0.80, 0.70, 0.20],  # 5
                    [0.70, 0.20, 0.60],  # 6
                    [0.20, 0.65, 0.65],  # 7
                    [0.85, 0.45, 0.10],  # 8
                    [0.50, 0.50, 0.80],  # 9
                ],
                F32,
            )
        ),
        emission=jnp.asarray(
            np.concatenate(
                [np.zeros((1, 3), F32), np.full((1, 3), 18.0, F32), np.zeros((8, 3), F32)]
            )
        ),
        texture_id=jnp.asarray(-np.ones((10,), I32)),
    )
    mb = MeshBuilder()
    # Floor quad (y=0) and emissive ceiling panel quad (y=2), both CCW-up/down.
    mb.add_quad([-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2], 0)
    mb.add_quad([-0.6, 2.0, -0.6], [-0.6, 2.0, 0.6], [0.6, 2.0, 0.6], [0.6, 2.0, -0.6], 1)
    tris = mb.build()
    # 8 spheres in two rows of four.
    centers, radii, mids = [], [], []
    for i in range(8):
        row, col = divmod(i, 4)
        centers.append([-1.2 + 0.8 * col, 0.3, -0.6 + 1.0 * row])
        radii.append(0.3)
        mids.append(2 + i)
    spheres = Spheres(
        center=jnp.asarray(np.array(centers, F32)),
        radius=jnp.asarray(np.array(radii, F32)),
        material_id=jnp.asarray(np.array(mids, I32)),
    )
    lights = derive_lights(mats, spheres, tris)
    cam = _camera([0.0, 1.4, 4.2], [0.0, 0.5, 0.0], fov=50.0)
    return make_scene(spheres, tris, mats, lights, None, cam)


def bunny_scene(subdiv: int = 6) -> Scene:
    """Config 2 (BASELINE.json:8): bunny-class mesh (~70k tris at subdiv=6:
    20*4^6 = 81920 tris) + floor + area light, direct lighting."""
    mats = Materials(
        albedo=jnp.asarray(np.array([[0.73, 0.73, 0.73], [0, 0, 0], [0.55, 0.44, 0.35]], F32)),
        emission=jnp.asarray(np.array([[0, 0, 0], [14.0, 14.0, 14.0], [0, 0, 0]], F32)),
        texture_id=jnp.asarray(-np.ones((3,), I32)),
    )
    mb = MeshBuilder()
    mb.add_quad([-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4], 0)
    mb.add_quad([-1, 3.0, -1], [-1, 3.0, 1], [1, 3.0, 1], [1, 3.0, -1], 1)
    v, f, uv = icosphere(subdiv, radius=0.8, center=(0.0, 0.9, 0.0))
    mb.add_mesh(v, f, 2, uv)
    tris = mb.build()
    spheres = None
    from blink.scene.scene import empty_spheres

    spheres = empty_spheres()
    lights = derive_lights(mats, spheres, tris)
    cam = _camera([0.0, 1.6, 3.4], [0.0, 0.8, 0.0], fov=45.0)
    return make_scene(spheres, tris, mats, lights, None, cam)


def sponza_scene(n_tris: int = 1_000_000, textured: bool = True, seed: int = 7) -> Scene:
    """Config 4/5 (BASELINE.json:10-11): Sponza-class hall, ~n_tris triangles.

    A colonnaded hall: floor/walls, a grid of columns (subdivided icospheres
    stacked into pillars) filling the triangle budget, checker-textured floor
    and column materials, one large area light. Every triangle is unique
    geometry (no instancing) so BVH + bandwidth costs are honest.
    """
    rng = np.random.default_rng(seed)
    mats_albedo = [
        [0.75, 0.72, 0.68],  # 0 floor (textured)
        [0.0, 0.0, 0.0],  # 1 light
        [0.70, 0.65, 0.58],  # 2 walls
    ]
    mats_emission = [[0, 0, 0], [22.0, 21.0, 19.0], [0, 0, 0]]
    mats_tex = [0 if textured else -1, -1, -1]
    n_col_mats = 6
    for i in range(n_col_mats):
        c = 0.35 + 0.55 * rng.random(3)
        mats_albedo.append(list(c))
        mats_emission.append([0, 0, 0])
        mats_tex.append(1 if (textured and i % 2 == 0) else -1)
    mats = Materials(
        albedo=jnp.asarray(np.array(mats_albedo, F32)),
        emission=jnp.asarray(np.array(mats_emission, F32)),
        texture_id=jnp.asarray(np.array(mats_tex, I32)),
    )
    textures = (
        jnp.asarray(
            np.stack(
                [
                    checker_texture(64, 8),
                    checker_texture(64, 16, (0.85, 0.8, 0.7), (0.45, 0.35, 0.3)),
                ]
            )
        )
        if textured
        else None
    )

    mb = MeshBuilder()
    hall_x, hall_y, hall_z = 20.0, 8.0, 40.0
    mb.add_quad([-hall_x, 0, -hall_z], [hall_x, 0, -hall_z], [hall_x, 0, hall_z], [-hall_x, 0, hall_z], 0)
    # Side walls + back wall.
    mb.add_quad([-hall_x, 0, -hall_z], [-hall_x, 0, hall_z], [-hall_x, hall_y, hall_z], [-hall_x, hall_y, -hall_z], 2)
    mb.add_quad([hall_x, 0, hall_z], [hall_x, 0, -hall_z], [hall_x, hall_y, -hall_z], [hall_x, hall_y, hall_z], 2)
    mb.add_quad([-hall_x, 0, -hall_z], [-hall_x, hall_y, -hall_z], [hall_x, hall_y, -hall_z], [hall_x, 0, -hall_z], 2)
    mb.add_quad([-6, hall_y - 0.01, -12], [-6, hall_y - 0.01, 12], [6, hall_y - 0.01, 12], [6, hall_y - 0.01, -12], 1)

    # Column budget: each orb is 20*4^subdiv tris; subdiv=3 -> 1280 tris.
    base = sum(len(x) for x in mb.idx)
    per_orb = 20 * 4**3
    n_orbs = max(1, (n_tris - base) // per_orb)
    # Lay orbs out as stacked pillars on a grid.
    stack_h = 4
    n_pillars = max(1, n_orbs // stack_h)
    gx = int(np.ceil(np.sqrt(n_pillars / 2)))
    gz = int(np.ceil(n_pillars / max(gx, 1)))
    placed = 0
    for pz in range(gz):
        for px in range(gx):
            if placed >= n_orbs:
                break
            x = -hall_x * 0.8 + (1.6 * hall_x * 0.8) * (px + 0.5) / gx
            z = -hall_z * 0.9 + (1.8 * hall_z * 0.9) * (pz + 0.5) / gz
            jx, jz = 0.25 * rng.standard_normal(2)
            for s in range(stack_h):
                if placed >= n_orbs:
                    break
                r = 0.5 - 0.06 * s + 0.05 * rng.random()
                v, f, uv = icosphere(3, radius=r, center=(x + jx, 0.5 + 1.0 * s, z + jz))
                mb.add_mesh(v, f, 3 + int(rng.integers(n_col_mats)), uv)
                placed += 1
    tris = mb.build()
    from blink.scene.scene import empty_spheres

    spheres = empty_spheres()
    lights = derive_lights(mats, spheres, tris)
    cam = _camera([0.0, 3.0, hall_z * 0.95], [0.0, 2.0, 0.0], fov=55.0)
    return make_scene(spheres, tris, mats, lights, textures, cam)


def sponza_scene_instanced(n_tris: int = 1_000_000, seed: int = 7):
    """Config 4's "2-level BVH" scene in its NATIVE form (BASELINE.json:10;
    VERDICT r2 #5): the same colonnaded hall expressed as unique OBJECTS +
    INSTANCE transforms instead of flattened unique geometry.

    Objects: the hall shell (floor/walls/light) and one unit icosphere per
    column material. Instances: one identity-instance of the hall plus one
    scaled+translated icosphere instance per orb. Returns
    (object_tris, obj_of_inst, o2w, scene) where `scene` holds the
    flattened world-space triangles (bvh.tlas.instance_scene_triangles) —
    bit-identical geometry to what a TLAS walk sees, so the production
    flat-chunk path and the two-level path are directly comparable
    (benchmarks/tlas_vs_chunks.py)."""
    rng = np.random.default_rng(seed)
    mats_albedo = [
        [0.75, 0.72, 0.68],
        [0.0, 0.0, 0.0],
        [0.70, 0.65, 0.58],
    ]
    mats_emission = [[0, 0, 0], [22.0, 21.0, 19.0], [0, 0, 0]]
    mats_tex = [-1, -1, -1]
    n_col_mats = 6
    for i in range(n_col_mats):
        c = 0.35 + 0.55 * rng.random(3)
        mats_albedo.append(list(c))
        mats_emission.append([0, 0, 0])
        mats_tex.append(-1)
    mats = Materials(
        albedo=jnp.asarray(np.array(mats_albedo, F32)),
        emission=jnp.asarray(np.array(mats_emission, F32)),
        texture_id=jnp.asarray(np.array(mats_tex, I32)),
    )

    # Object 0: the hall shell (identity instance).
    mb = MeshBuilder()
    hall_x, hall_y, hall_z = 20.0, 8.0, 40.0
    mb.add_quad([-hall_x, 0, -hall_z], [hall_x, 0, -hall_z], [hall_x, 0, hall_z], [-hall_x, 0, hall_z], 0)
    mb.add_quad([-hall_x, 0, -hall_z], [-hall_x, 0, hall_z], [-hall_x, hall_y, hall_z], [-hall_x, hall_y, -hall_z], 2)
    mb.add_quad([hall_x, 0, hall_z], [hall_x, 0, -hall_z], [hall_x, hall_y, -hall_z], [hall_x, hall_y, hall_z], 2)
    mb.add_quad([-hall_x, 0, -hall_z], [-hall_x, hall_y, -hall_z], [hall_x, hall_y, -hall_z], [hall_x, 0, -hall_z], 2)
    mb.add_quad([-6, hall_y - 0.01, -12], [-6, hall_y - 0.01, 12], [6, hall_y - 0.01, 12], [6, hall_y - 0.01, -12], 1)
    hall = mb.build()

    # Objects 1..n_col_mats: a unit icosphere per column material.
    objects = [hall]
    for i in range(n_col_mats):
        ob = MeshBuilder()
        v, f, uv = icosphere(3, radius=1.0, center=(0.0, 0.0, 0.0))
        ob.add_mesh(v, f, 3 + i, uv)
        objects.append(ob.build())

    base = int(np.asarray(hall.idx).shape[0])
    per_orb = 20 * 4**3
    n_orbs = max(1, (n_tris - base) // per_orb)
    stack_h = 4
    n_pillars = max(1, n_orbs // stack_h)
    gx = int(np.ceil(np.sqrt(n_pillars / 2)))
    gz = int(np.ceil(n_pillars / max(gx, 1)))
    obj_of_inst = [0]
    o2w = [np.concatenate([np.eye(3, dtype=np.float32),
                           np.zeros((3, 1), np.float32)], axis=1)]
    placed = 0
    for pz in range(gz):
        for px in range(gx):
            if placed >= n_orbs:
                break
            x = -hall_x * 0.8 + (1.6 * hall_x * 0.8) * (px + 0.5) / gx
            z = -hall_z * 0.9 + (1.8 * hall_z * 0.9) * (pz + 0.5) / gz
            jx, jz = 0.25 * rng.standard_normal(2)
            for s in range(stack_h):
                if placed >= n_orbs:
                    break
                r = 0.5 - 0.06 * s + 0.05 * rng.random()
                m = np.zeros((3, 4), np.float32)
                m[:, :3] = r * np.eye(3, dtype=np.float32)
                m[:, 3] = [x + jx, 0.5 + 1.0 * s, z + jz]
                obj_of_inst.append(1 + int(rng.integers(n_col_mats)))
                o2w.append(m)
                placed += 1
    obj_of_inst = np.asarray(obj_of_inst, np.int32)
    o2w = np.stack(o2w)

    from blink.bvh.tlas import instance_scene_triangles
    from blink.scene.scene import empty_spheres

    tris = instance_scene_triangles(objects, obj_of_inst, o2w)
    spheres = empty_spheres()
    lights = derive_lights(mats, spheres, tris)
    cam = _camera([0.0, 3.0, hall_z * 0.95], [0.0, 2.0, 0.0], fov=55.0)
    scene = make_scene(spheres, tris, mats, lights, None, cam)
    return objects, obj_of_inst, o2w, scene

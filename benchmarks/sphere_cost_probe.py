"""Measure the analytic sphere-pass cost on chip (VERDICT r3 ask #8):
is the brute vmapped jnp sphere test (<=8 spec spheres, SURVEY §2
'Ray-sphere kernel') negligible next to the Pallas triangle traversal, or
does it need an in-kernel Pallas specialization?

Times backend.intersect at 1024^2 on the 1M-tri scene with 0 vs 8 spheres.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/sphere_cost_probe.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=5):
    r = f(*a)
    chk = float(np.sum(np.asarray(jax.tree_util.tree_leaves(r)[0], np.float64)))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps, chk


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.scene.scene import Spheres, empty_spheres

    size = 1024
    cfg = get_config("sponza").override(width=size, height=size)
    scene0 = build_scene(cfg)
    # 8 spheres sprinkled through the scene bounds
    lo = np.asarray(jnp.min(scene0.triangles.verts, axis=0))
    hi = np.asarray(jnp.max(scene0.triangles.verts, axis=0))
    rng = np.random.default_rng(0)
    c = rng.uniform(lo, hi, size=(8, 3)).astype(np.float32)
    r = np.full((8,), 0.05 * float(np.max(hi - lo)), np.float32)
    scene8 = scene0.replace(spheres=Spheres(
        center=jnp.asarray(c), radius=jnp.asarray(r),
        material_id=jnp.zeros((8,), jnp.int32)))

    backend = make_backend("pallas", scene0)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene0))
    isect = jax.jit(lambda o, d, s: backend.intersect(o, d, s))
    for name, sc in [("0 spheres", scene0), ("8 spheres", scene8)]:
        dt, chk = timeit(isect, o, d, sc)
        print(f"{name}: {dt*1e3:8.2f} ms  {n/dt/1e6:6.2f} Mrays/s  chk={chk:.4e}",
              flush=True)


if __name__ == "__main__":
    main()

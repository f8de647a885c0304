"""On-chip probe: post-overhaul stage breakdown + packet-height sweep.

Builds the 1M-tri scene/backend ONCE, then times:
  1. each stage of the production direct-lighting path (raygen, closest,
     refine, NEE, full render) — the post-data-movement-overhaul frame;
  2. the wide traversal kernel at packet heights rows in {8, 16, 32}
     (the SMEM-node kernel changed the walk-overhead/leaf-sharing
     balance; round-1's "32 rows fastest" predates it).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/rows_probe.py [tris] [size]
"""
from __future__ import annotations

import sys
import time

import jax


def timeit(f, *a, reps=3):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    from blink.api import build_scene
    from blink.config import get_config
    from blink.diff.hitrefine import refine
    from blink.kernels.api import make_backend
    from blink.kernels.traverse_pallas import traverse_closest_wide
    from blink.render.api import _tile_shape, render_image, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import li_direct, nee_direct

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    print(f"build: {time.perf_counter()-t0:.1f}s tris={scene.n_triangles} "
          f"chunks={len(backend.bvh)}", flush=True)
    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)

    def rays(s):
        return generate_rays(s.camera, size, size, key, 0, False, pixel_id=pid)

    o, d, pk = jax.block_until_ready(jax.jit(rays)(scene))

    stages = {}
    stages["raygen(tiled)"] = timeit(jax.jit(rays), scene)

    isect = jax.jit(lambda o, d, s: backend.intersect(o, d, s))
    stages["closest"] = timeit(isect, o, d, scene)
    hit = jax.block_until_ready(isect(o, d, scene))

    ref_f = jax.jit(lambda o, d, h, s: refine(o, d, h, s, backend.shade))
    stages["refine"] = timeit(ref_f, o, d, hit, scene)
    geom = jax.block_until_ready(ref_f(o, d, hit, scene))

    nee = jax.jit(lambda s, g, k: nee_direct(s, g, k, backend, 0, False))
    stages["nee(sample+shadow+brdf)"] = timeit(nee, scene, geom, pk)

    full = jax.jit(lambda o, d, k, s: li_direct(o, d, k, s, backend, False))
    stages["li_direct total"] = timeit(full, o, d, pk, scene)

    img = jax.jit(lambda s: render_image(s, cfg, backend))
    stages["render_image"] = timeit(img, scene)

    print(f"--- stage times ({size}x{size}, {scene.n_triangles} tris) ---",
          flush=True)
    for k, v in stages.items():
        print(f"{k:28s} {v*1e3:9.2f} ms   {n/v/1e6:8.2f} Mrays/s",
              flush=True)

    print("--- packet-height x leaf-cull-granularity sweep (closest) ---",
          flush=True)
    for rows, rg in ((32, 4), (32, 8), (32, 16), (16, 4), (16, 8), (8, 4),
                     (8, 8)):
        f = jax.jit(lambda a, b, r=rows, g=rg: traverse_closest_wide(
            a, b, backend.bvh, rows=r, row_groups=g))
        dt = timeit(f, o, d)
        print(f"rows={rows:2d} groups={rg:2d}  {dt*1e3:9.2f} ms  "
              f"{n/dt/1e6:8.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

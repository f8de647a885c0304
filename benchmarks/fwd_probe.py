"""Forward-render cost bisection: where do the ~120ms/frame outside the
traversal kernels go? Times each stage of the direct-lighting path
separately on chip (binary ordered_rg kernel for fast compiles).
PYTHONPATH=src python benchmarks/fwd_probe.py [tris]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(f, *a):
    t0 = time.perf_counter()
    jax.block_until_ready(f(*a))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 3, compile_s


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.diff.hitrefine import refine
    from blink.kernels.api import Backend
    from blink.kernels.traverse_pallas import build_chunked_packed
    from blink.render.api import _tile_perm, render_image
    from blink.render.camera import generate_rays
    from blink.render.integrators import li_direct, nee_direct
    from blink.sampling.lights import sample_light_point  # noqa: F401

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    size = 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = Backend(name="pallas", bvh=build_chunked_packed(scene.triangles))
    n = size * size
    key = jax.random.key(0)
    perm = _tile_perm(size, size)

    def rays(s):
        o, d, pk = generate_rays(s.camera, size, size, key, 0, False)
        return o[perm], d[perm], pk[perm]

    o, d, pk = jax.jit(rays)(scene)
    o, d, pk = jax.block_until_ready((o, d, pk))

    stages = {}
    dt, cs = timeit(jax.jit(rays), scene)
    stages["raygen+perm"] = dt

    isect = jax.jit(lambda o, d, s: backend.intersect(o, d, s))
    dt, cs = timeit(isect, o, d, scene)
    stages["closest(2ch)"] = dt
    hit = jax.block_until_ready(isect(o, d, scene))

    ref_f = jax.jit(lambda o, d, h, s: refine(o, d, h, s))
    dt, cs = timeit(ref_f, o, d, hit, scene)
    stages["refine"] = dt
    geom = jax.block_until_ready(ref_f(o, d, hit, scene))

    nee = jax.jit(
        lambda s, g, k: nee_direct(s, g, k, backend, 0, False)
    )
    dt, cs = timeit(nee, scene, geom, pk)
    stages["nee(sample+shadow+brdf)"] = dt

    full = jax.jit(lambda o, d, k, s: li_direct(o, d, k, s, backend, False))
    dt, cs = timeit(full, o, d, pk, scene)
    stages["li_direct total"] = dt

    img = jax.jit(
        lambda s: render_image(s, cfg, backend), static_argnums=()
    )
    dt, cs = timeit(img, scene)
    stages["render_image"] = dt

    for k, v in stages.items():
        print(f"{k:28s} {v*1e3:8.1f}ms  {n/v/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

"""Forward-render cost bisection: times each stage of the direct-lighting
path separately on chip, using the PRODUCTION pallas backend (8-wide
SMEM-node kernel + packed shade table + tiled arithmetic raygen).
python benchmarks/fwd_probe.py [tris] [size]
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
    from blink.kernels.api import make_backend
    from blink.render.api import render_image, tile_pixel_ids, _tile_shape
    from blink.render.camera import generate_rays
    from blink.render.integrators import li_direct, nee_direct

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)

    def rays(s):
        return generate_rays(s.camera, size, size, key, 0, False, pixel_id=pid)

    o, d, pk = jax.block_until_ready(jax.jit(rays)(scene))

    stages = {}
    dt, cs = timeit(jax.jit(rays), scene)
    stages["raygen(tiled)"] = dt

    isect = jax.jit(lambda o, d, s: backend.intersect(o, d, s))
    dt, cs = timeit(isect, o, d, scene)
    stages["closest"] = dt
    hit = jax.block_until_ready(isect(o, d, scene))

    ref_f = jax.jit(lambda o, d, h, s: refine(o, d, h, s, backend.shade))
    dt, cs = timeit(ref_f, o, d, hit, scene)
    stages["refine"] = dt
    geom = jax.block_until_ready(ref_f(o, d, hit, scene))

    nee = jax.jit(lambda s, g, k: nee_direct(s, g, k, backend, 0, False))
    dt, cs = timeit(nee, scene, geom, pk)
    stages["nee(sample+shadow+brdf)"] = dt

    full = jax.jit(lambda o, d, k, s: li_direct(o, d, k, s, backend, False))
    dt, cs = timeit(full, o, d, pk, scene)
    stages["li_direct total"] = dt

    img = jax.jit(lambda s: render_image(s, cfg, backend))
    dt, cs = timeit(img, scene)
    stages["render_image"] = dt

    for k, v in stages.items():
        print(f"{k:28s} {v*1e3:8.1f}ms  {n/v/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

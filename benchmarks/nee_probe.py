"""On-chip probe: bisect nee_direct's non-shadow cost (stage_probe2 saw
~73ms at 512^2/1M-tri beyond the anyhit shadow pass).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/nee_probe.py [tris] [size]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


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
    from blink.core import sampler, vec
    from blink.diff.hitrefine import refine
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import nee_direct
    from blink.sampling.lights import pack_light_rows, sample_light_point

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
          f"lights={scene.n_lights} mats={scene.materials.albedo.shape[0]}",
          flush=True)
    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, pk = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))
    isect = jax.jit(lambda o, d, s: backend.intersect(o, d, s))
    hit = jax.block_until_ready(isect(o, d, scene))
    ref_f = jax.jit(lambda o, d, h, s: refine(o, d, h, s, backend.shade))
    geom = jax.block_until_ready(ref_f(o, d, hit, scene))

    res = {}

    def ks(pkeys):
        bk = jax.vmap(lambda k: sampler.bounce_key(k, 0))(pkeys)
        return jax.vmap(lambda k: sampler.uniform(k, (3,), dim=0))(bk)

    res["keys: bounce_key+uniform3"] = timeit(jax.jit(ks), pk)
    u = jax.block_until_ready(jax.jit(ks)(pk))

    light = jnp.minimum(
        jnp.asarray(u[:, 0] * scene.n_lights, jnp.int32), scene.n_lights - 1
    )

    def samp(s, light, u):
        rows = pack_light_rows(s)
        return sample_light_point(s, light, u[:, 1], u[:, 2], rows=rows)

    res["sample_light_point"] = timeit(jax.jit(samp), scene, light, u)
    p_l, n_l, pdf, mat_l = jax.block_until_ready(
        jax.jit(samp)(scene, light, u))

    def geom_terms(g, p_l, n_l):
        to_l = p_l - g.p
        dist2 = vec.vdot(to_l, to_l)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi = to_l / dist[..., None]
        cos_s = jnp.maximum(vec.vdot(g.n, wi), 0.0)
        cos_l = jnp.abs(vec.vdot(n_l, wi))
        return wi, dist, cos_s, cos_l

    res["geometry terms"] = timeit(jax.jit(geom_terms), geom, p_l, n_l)
    wi, dist, cos_s, cos_l = jax.block_until_ready(
        jax.jit(geom_terms)(geom, p_l, n_l))

    def shadow(g, wi, dist, s):
        from blink.render.integrators import RAY_EPS
        shadow_o = g.p + g.n * RAY_EPS
        t_far = jax.lax.stop_gradient(dist) * (1.0 - 1e-3)
        return backend.occluded(shadow_o, wi, s, t_far)

    res["shadow occluded()"] = timeit(jax.jit(shadow), geom, wi, dist, scene)

    def emit_sweep(s, mat_l):
        from blink.core.rows import select_rows
        return select_rows(s.materials.emission, mat_l)

    res["emission select_rows"] = timeit(jax.jit(emit_sweep), scene, mat_l)

    nee = jax.jit(lambda s, g, k: nee_direct(s, g, k, backend, 0, False))
    res["nee_direct total"] = timeit(nee, scene, geom, pk)

    for k, v in res.items():
        print(f"{k:28s} {v*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()

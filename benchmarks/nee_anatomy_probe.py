"""Round-5: dissect the NEE term at 1024² (bwd_probe4 put NEE forward at
~87 ms and its backward at ~113 ms — far above any roofline estimate of
its elementwise work).

Stages:
  fused_chain     50 dependent elementwise ops on (N,3), one fusion —
                  the baseline cost of elementwise FLOPs here
  barrier_chain   the same 50 ops with optimization_barrier between them
                  — measures PER-KERNEL fixed overhead x 50 (the backward
                  pass naturally fragments into many small fusions)
  real_shadow     the PRODUCTION shadow anyhit alone: rays from primary
                  hit points to the block-shared light samples (inputs
                  precomputed; times only backend.occluded)
  nee_noshadow    nee_direct forward with occlusion forced unblocked
                  (shadow anyhit compiled out) — the sampling/shading
                  elementwise remainder
  nee_full        nee_direct forward as production (ref: shadow + rest)

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/nee_anatomy_probe.py [tris] [size]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=5):
    r = f(*a)
    leaf = jax.tree_util.tree_leaves(r)[0]
    chk = float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    leaf = jax.tree_util.tree_leaves(r)[0]
    chk2 = float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    assert chk == chk2, (chk, chk2)
    return dt


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.core import sampler, vec
    from blink.diff.hitrefine import refine
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import RAY_EPS, nee_direct
    from blink.sampling.lights import pack_light_rows, sample_light_point

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    print(f"tris={scene.n_triangles} size={size}", flush=True)

    # --- elementwise cost model --------------------------------------
    x = jnp.ones((n, 3), jnp.float32)

    def chain(x, barrier):
        for i in range(50):
            x = x * 1.0000001 + 0.0000001
            if barrier:
                x = jax.lax.optimization_barrier(x)
        return x

    dt = timeit(jax.jit(lambda v: chain(v, False)), x)
    print(f"fused_chain    {dt*1e3:8.2f} ms  (50 elementwise ops, 1 fusion)",
          flush=True)
    dt = timeit(jax.jit(lambda v: chain(v, True)), x)
    print(f"barrier_chain  {dt*1e3:8.2f} ms  (50 kernels -> "
          f"{dt*1e3/50:.2f} ms/kernel)", flush=True)

    # --- production shadow stage in isolation ------------------------
    o, d, keys = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))

    @jax.jit
    def prep(o, d, keys, scene):
        hit = backend.intersect(o, d, scene)
        geom = refine(o, d, hit, scene, shade=backend.shade)
        stream = keys[..., 2:4]
        bk = jax.vmap(lambda k: sampler.bounce_key(k, 0))(stream)
        u = jax.vmap(lambda k: sampler.uniform(k, (3,), dim=0))(bk)
        nl = scene.n_lights
        light = jnp.minimum(jnp.asarray(u[:, 0] * nl, jnp.int32), nl - 1)
        p_l, n_l, pdf, mat_l = sample_light_point(
            scene, light, u[:, 1], u[:, 2], rows=pack_light_rows(scene)
        )
        to_l = p_l - geom.p
        dist = jnp.sqrt(jnp.maximum(vec.vdot(to_l, to_l), 1e-12))
        wi = to_l / dist[..., None]
        shadow_o = geom.p + geom.n * RAY_EPS
        t_far = jnp.where(geom.valid, dist * (1.0 - 1e-3), 0.0)
        return geom, shadow_o, wi, t_far

    geom, shadow_o, wi, t_far = jax.block_until_ready(
        prep(o, d, keys, scene))
    occ = jax.jit(lambda a, b, c, s: backend.occluded(a, b, s, c))
    dt = timeit(occ, shadow_o, wi, t_far, scene)
    blocked = occ(shadow_o, wi, t_far, scene)
    print(f"real_shadow    {dt*1e3:8.2f} ms  {n/dt/1e6:6.2f} Mrays/s  "
          f"blocked={float(jnp.mean(blocked)):.3f}", flush=True)

    # --- NEE forward with/without the shadow walk ---------------------
    class NoShadowBackend:
        shade = backend.shade

        def occluded(self, o, d, s, tf):
            return jnp.zeros(tf.shape, bool)

        def intersect(self, o, d, s):
            return backend.intersect(o, d, s)

    for name, be in (("nee_noshadow", NoShadowBackend()),
                     ("nee_full", backend)):
        f = jax.jit(lambda g, k, s, b=be: nee_direct(s, g, k, b, 0, False))
        dt = timeit(f, geom, keys, scene)
        print(f"{name:14s} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

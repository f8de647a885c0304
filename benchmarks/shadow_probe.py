"""Dissect WHY the real shadow-ray workload runs ~12x slower per ray than
coherent camera any-hit (2.9 vs 37 Mrays/s, bwd_probe2 2026-08-19).

Variants (all 512^2 primary hits on the 1M scene, production chunks):
  real       o=hit+eps*n, wi->sampled light point, t_far=dist (the NEE rays)
  one-point  same origins, every ray aimed at ONE fixed light point
             (kills per-ray light-choice/area-sample direction spread)
  det-light  per-ray CENTROID of the ray's chosen light (kills area jitter,
             keeps light-choice spread)
  tf0        real rays but t_far=0 (never passes a slab: pure packing +
             walk-entry overhead floor)
  reversed   origin=light point, d=-wi, same t_far (light-side coherence)
  camera     the coherent camera anyhit sweep for reference

Also prints the blocked fraction (early-exit availability).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/shadow_probe.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=5):
    r0 = f(*a)
    chk = float(np.sum(np.asarray(
        jax.tree_util.tree_leaves(r0)[0], np.float64)))
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps, chk


def main() -> None:
    from blink.api import build_scene
    from blink.config import get_config
    from blink.core import sampler, vec
    from blink.diff.hitrefine import refine
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import RAY_EPS
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
          f"lights={scene.n_lights} chunks={len(backend.bvh)}", flush=True)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    o, d, pk = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))
    isect = jax.jit(lambda o, d, s: backend.intersect(o, d, s))
    hit = jax.block_until_ready(isect(o, d, scene))
    geom = jax.block_until_ready(jax.jit(
        lambda o, d, h, s: refine(o, d, h, s, backend.shade))(o, d, hit,
                                                              scene))

    # NEE sampling exactly as integrators.nee_direct does it.
    bk = jax.vmap(lambda k: sampler.bounce_key(k, 0))(pk)
    u = jax.vmap(lambda k: sampler.uniform(k, (3,), dim=0))(bk)
    light = jnp.minimum(
        jnp.asarray(u[:, 0] * scene.n_lights, jnp.int32), scene.n_lights - 1
    )
    rows = pack_light_rows(scene)
    p_l, n_l, pdf, mat_l = sample_light_point(
        scene, light, u[:, 1], u[:, 2], rows=rows)
    p_l = jax.block_until_ready(p_l)

    def mk(origin, target, tf_scale=1.0):
        to_l = target - origin
        dist = jnp.sqrt(jnp.maximum(vec.vdot(to_l, to_l), 1e-12))
        wi = to_l / dist[..., None]
        t_far = dist * (1.0 - 1e-3) * tf_scale
        return origin, wi, t_far

    shadow_o = geom.p + geom.n * RAY_EPS
    occ = jax.jit(lambda o, w, t, s: backend.occluded(o, w, s, t))

    variants = {}
    o_r, w_r, t_r = mk(shadow_o, p_l)
    variants["real"] = (o_r, w_r, t_r)
    fixed_pt = jnp.broadcast_to(p_l[0], p_l.shape)
    variants["one-point"] = mk(shadow_o, fixed_pt)
    # centroid of each ray's chosen light: resample with fixed interior uv
    p_c, _, _, _ = sample_light_point(
        scene, light, jnp.full((n,), 4.0 / 9.0), jnp.full((n,), 0.5),
        rows=rows)
    variants["det-light"] = mk(shadow_o, p_c)
    variants["tf0"] = (o_r, w_r, jnp.zeros_like(t_r))
    variants["reversed"] = (p_l, -w_r, t_r)
    variants["camera"] = (o, d, jnp.full((n,), 100.0, jnp.float32))

    # --- coherence-sort variants: reorder the REAL rays so each packed
    # 1024-ray cull group covers a compact origin cluster, then scatter
    # blocked back. Measures END-TO-END (key+argsort+gathers+walk+scatter).
    lo = jnp.min(scene.triangles.verts, axis=0)
    hi = jnp.max(scene.triangles.verts, axis=0)

    def _part1by2(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    def morton(p):
        q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
        q = jnp.asarray(q * 1023.0, jnp.int32)
        return (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
                | (_part1by2(q[:, 2]) << 2))

    def occ_sorted(oo, ww, tt, s):
        key = jnp.where(tt > 0.0, morton(oo), jnp.int32(0x7FFFFFFF))
        order = jnp.argsort(key)
        b = occ(oo[order], ww[order], tt[order], s)
        return jnp.zeros_like(b).at[order].set(b)

    def occ_sorted_tile(oo, ww, tt, s):
        # Cheaper near-sort: keep rays in place, sort only at 1024-ray
        # granularity? (baseline for sort-cost attribution: identity perm)
        order = jnp.argsort(jnp.zeros_like(tt, jnp.int32))
        b = occ(oo[order], ww[order], tt[order], s)
        return jnp.zeros_like(b).at[order].set(b)

    variants["sorted"] = (o_r, w_r, t_r)
    variants["sort-cost"] = (o_r, w_r, t_r)

    blocked = jax.block_until_ready(occ(o_r, w_r, t_r, scene))
    print(f"blocked fraction (real): {float(jnp.mean(blocked)):.3f}",
          flush=True)

    fns = {"sorted": jax.jit(occ_sorted), "sort-cost": jax.jit(occ_sorted_tile)}
    for name, (oo, ww, tt) in variants.items():
        f = fns.get(name, occ)
        dt, chk = timeit(f, oo, ww, tt, scene)
        print(f"{name:10s} {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mrays/s  "
              f"blocked={chk/n:.3f}", flush=True)


if __name__ == "__main__":
    main()

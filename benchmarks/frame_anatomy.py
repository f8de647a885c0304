"""Round-4 frame anatomy: per-stage wall time of the direct-lighting
pipeline AFTER the tree-shape + shadow-coherence wins, to find where the
non-kernel forward time now sits (the traversal kernels are ~15-18 ms of
a ~58 ms 512^2 frame — something else owns the rest).

Stages (each its own jit, checksummed sustained timing):
  raygen        generate_rays with tiled pixel ids
  closest       production chunked closest-hit traversal
  refine        diff.hitrefine on the traversal output (shade-table mode)
  refine_dirty  same, narrow-gather mode (geom_dirty)
  occluded      one shadow anyhit pass at NEE t_far shape
  nee           nee_direct complete (sampling + occluded + shading)
  li_direct     full per-ray radiance (= the one_sample body)
  render_image  the user-facing frame (spp loop + untile)

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/frame_anatomy.py \
        [tris] [size]
"""
from __future__ import annotations

import functools
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
    # Stop the clock at device completion; the host transfer + f64
    # checksum below is the real-completion guard, not timed work
    # (ADVICE r4: timing it inflated ms-level stage attribution).
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    leaf = jax.tree_util.tree_leaves(r)[0]
    chk2 = float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    assert chk == chk2, (chk, chk2)
    return dt, chk


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.diff.hitrefine import refine
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, render_image, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import li_direct, nee_direct

    tris_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris_n,
    )
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    print(f"build {time.perf_counter()-t0:.0f}s chunks={len(backend.bvh)}",
          flush=True)
    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)

    gen = jax.jit(lambda s: generate_rays(s.camera, size, size, key, 0,
                                          False, pixel_id=pid))
    dt, chk = timeit(lambda: gen(scene))
    print(f"raygen        {dt*1e3:8.2f} ms  chk={chk:.4e}", flush=True)
    o, d, pkeys = jax.block_until_ready(gen(scene))

    hitf = jax.jit(lambda o, d, s, b: b.intersect(o, d, s))
    dt, chk = timeit(lambda: hitf(o, d, scene, backend))
    print(f"closest       {dt*1e3:8.2f} ms  chk={chk:.4e}", flush=True)
    hit = jax.block_until_ready(hitf(o, d, scene, backend))

    reff = jax.jit(lambda o, d, h, s, sh: refine(o, d, h, s, shade=sh))
    dt, chk = timeit(lambda: reff(o, d, hit, scene, backend.shade))
    print(f"refine        {dt*1e3:8.2f} ms  chk={chk:.4e}", flush=True)
    dt, chk = timeit(lambda: reff(o, d, hit, scene, None))
    print(f"refine_dirty  {dt*1e3:8.2f} ms  chk={chk:.4e}", flush=True)
    geom = jax.block_until_ready(reff(o, d, hit, scene, backend.shade))

    neef = jax.jit(lambda s, g, k, b: nee_direct(s, g, k, b, 0, False))
    dt, chk = timeit(lambda: neef(scene, geom, pkeys, backend))
    print(f"nee           {dt*1e3:8.2f} ms  chk={chk:.4e}", flush=True)

    # occluded alone at the NEE shape: replay nee's shadow rays
    shadow_o = geom.p + geom.n * 1e-3
    wi = jnp.where(geom.valid[..., None], geom.n, jnp.ones_like(geom.n))
    tfar = jnp.where(geom.valid, 5.0, 0.0)
    occf = jax.jit(lambda o2, d2, s, b, tf: b.occluded(o2, d2, s, tf))
    dt, chk = timeit(lambda: occf(shadow_o, wi, scene, backend, tfar))
    print(f"occluded~     {dt*1e3:8.2f} ms  (normal-dir proxy) chk={chk:.4e}",
          flush=True)

    lif = jax.jit(lambda o, d, k, s, b: li_direct(o, d, k, s, b, False))
    dt, chk = timeit(lambda: lif(o, d, pkeys, scene, backend))
    print(f"li_direct     {dt*1e3:8.2f} ms  chk={chk:.4e}", flush=True)

    rif = jax.jit(functools.partial(render_image, cfg=cfg))
    dt, chk = timeit(lambda: rif(scene, backend=backend))
    print(f"render_image  {dt*1e3:8.2f} ms  {n/dt/1e6:6.2f} Mrays/s  "
          f"chk={chk:.4e}", flush=True)


if __name__ == "__main__":
    main()

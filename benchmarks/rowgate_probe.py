"""On-chip A/B: leaf_mode 'group' (current production) vs 'row'
(row-granular gating + 8-tris-in-sublanes batches) on the 1M-tri scene.

Motivation (benchmarks/union_sim.py): at 1024-ray cull granularity the
kernel delivers 803 leaf tests/ray vs 14.9 needed; at 128-ray
granularity 220/ray — a projected ~2x on the leaf-bound kernel.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/rowgate_probe.py [tris] [size]
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
    from blink.kernels.api import make_backend
    from blink.kernels.traverse_pallas import (
        traverse_anyhit_wide,
        traverse_closest_wide,
    )
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
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
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))

    ref = None
    for mode in ("group", "row"):
        f = jax.jit(lambda a, b, m=mode: traverse_closest_wide(
            a, b, backend.bvh, leaf_mode=m))
        dt = timeit(f, o, d)
        t, p = jax.block_until_ready(f(o, d))
        if ref is None:
            ref = (t, p)
        else:
            import numpy as np

            same = bool(
                np.array_equal(np.asarray(p), np.asarray(ref[1]))
                and np.allclose(np.asarray(t), np.asarray(ref[0]),
                                atol=1e-5)
            )
            print(f"  on-chip parity row==group: {same}", flush=True)
        print(f"closest leaf_mode={mode:5s}  {dt*1e3:9.2f} ms  "
              f"{n/dt/1e6:8.2f} Mrays/s", flush=True)

    tf = jnp.full((n,), 100.0, jnp.float32)
    for mode in ("group", "row"):
        f = jax.jit(lambda a, b, m=mode: traverse_anyhit_wide(
            a, b, backend.bvh, tf, leaf_mode=m))
        dt = timeit(f, o, d)
        print(f"anyhit  leaf_mode={mode:5s}  {dt*1e3:9.2f} ms  "
              f"{n/dt/1e6:8.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

"""On-chip sweep of the wide-kernel configuration space the round-2 close
left open: packet rows x leaf_mode (the old rows sweep predates row
gating), plus a leaf_mode='skip' stage bisection (walk without leaf
tests — an UPPER bound on walk cost for closest, since skipping leaves
also skips best-t culling).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/wide_sweep.py \
        [tris] [size]
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
    cases = [
        (32, 4, "skip"),   # stage bisection: walk-only upper bound
        (32, 4, "group"),  # production baseline
        (16, 4, "group"),
        (16, 4, "row"),
        (8, 4, "group"),
        (8, 4, "row"),
        (32, 8, "group"),  # finer static gating re-probe
    ]
    for rows, rg, mode in cases:
        f = jax.jit(lambda a, b, r=rows, g=rg, m=mode: traverse_closest_wide(
            a, b, backend.bvh, rows=r, row_groups=g, leaf_mode=m))
        try:
            dt = timeit(f, o, d)
        except Exception as e:
            print(f"closest rows={rows:2d} rg={rg} {mode:5s}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        tag = ""
        if mode != "skip":
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
                tag = f"  parity={same}"
        print(f"closest rows={rows:2d} rg={rg} {mode:5s}  {dt*1e3:9.2f} ms"
              f"  {n/dt/1e6:8.2f} Mrays/s{tag}", flush=True)

    tf = jnp.full((n,), 100.0, jnp.float32)
    for rows, mode in [(32, "skip"), (32, "row"), (16, "row"), (8, "row")]:
        f = jax.jit(lambda a, b, r=rows, m=mode: traverse_anyhit_wide(
            a, b, backend.bvh, tf, rows=r, leaf_mode=m))
        try:
            dt = timeit(f, o, d)
        except Exception as e:
            print(f"anyhit  rows={rows:2d} {mode:5s}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"anyhit  rows={rows:2d} {mode:5s}  {dt*1e3:9.2f} ms  "
              f"{n/dt/1e6:8.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

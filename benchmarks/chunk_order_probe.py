"""A/B: Morton chunk order vs near-to-far (camera-sorted) chunk order on
the flagship closest-hit + anyhit workload. The multi-pass traversal
threads best-t between chunk passes, so pass order changes how tight the
bound is when each chunk walks — exactness is unaffected (verified: 0
mismatches on CPU tiny scene and hit checksum compared here).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/chunk_order_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=5):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    size = 1024
    cfg = get_config("sponza").override(
        width=size, height=size, backend="pallas", sponza_tris=1_000_000
    )
    scene = build_scene(cfg)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))
    tf = jnp.full((n,), 100.0, jnp.float32)
    cam = np.asarray(scene.camera.origin, np.float32)

    ref = {}
    for label, ofrom in (("morton", None), ("near-first", cam)):
        t0 = time.perf_counter()
        chunks = build_chunked_wide(
            scene.triangles, chunk_tris=250_000, quant=True,
            row_tables=False, order_from=ofrom,
        )
        print(f"{label}: build {time.perf_counter()-t0:.1f}s "
              f"chunks={len(chunks)}", flush=True)
        fc = jax.jit(lambda a, b, c=tuple(chunks):
                     traverse_closest_wide(a, b, list(c)))
        fa = jax.jit(lambda a, b, t, c=tuple(chunks):
                     traverse_anyhit_wide(a, b, list(c), t))
        dt_c = timeit(fc, o, d)
        dt_a = timeit(fa, o, d, tf)
        t, p = jax.block_until_ready(fc(o, d))
        ref[label] = (np.asarray(t), np.asarray(p))
        print(f"  closest {dt_c*1e3:7.2f} ms ({n/dt_c/1e6:6.2f} Mrays/s)  "
              f"anyhit {dt_a*1e3:7.2f} ms ({n/dt_a/1e6:6.2f} Mrays/s)",
              flush=True)

    t0_, p0_ = ref["morton"]
    t1_, p1_ = ref["near-first"]
    tm = np.abs(t0_ - t1_) > 1e-5
    pm = p0_ != p1_
    print(f"parity: t mism={int(tm.sum())} prim mism={int(pm.sum())} "
          f"(t-equal ties={int((pm & ~tm).sum())})", flush=True)


if __name__ == "__main__":
    main()

"""Quantify host-dispatch overhead in the chunked traversal: the same
jitted frame timed (a) blocked per call (harness._time) vs (b) unblocked
back-to-back (quant_sweep2.timeit). The delta bounds what fusing the
C chunk passes into one pallas_call (grid over chunks) can recover.

Also sweeps wide_leaf 24 vs 32 at the production chunking to separate
that variable (quant_sweep2 measured 20.7 Mrays/s at wl=24 while the
production default is wl=32).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/dispatch_gap_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def t_blocked(f, *a, reps=5):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def t_pipelined(f, *a, reps=5):
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
        traverse_closest_chunked,
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

    for wl in (32, 24):
        chunks = build_chunked_wide(
            scene.triangles, chunk_tris=250_000, quant=True,
            row_tables=False, wide_leaf=wl,
        )
        f = jax.jit(lambda a, b, c=tuple(chunks):
                    traverse_closest_chunked(a, b, list(c)))
        db = t_blocked(f, o, d)
        dp = t_pipelined(f, o, d)
        print(f"wl={wl} chunks={len(chunks)} "
              f"blocked {db*1e3:7.2f} ms ({n/db/1e6:6.2f} Mrays/s) | "
              f"pipelined {dp*1e3:7.2f} ms ({n/dp/1e6:6.2f} Mrays/s) | "
              f"gap {(db-dp)*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

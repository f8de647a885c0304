"""Finish the quant sweep: remaining (chunk_tris, wide_leaf) points and a
CHARACTERIZATION of the cross-chunking parity mismatch seen at ct=250k
(different chunk partitions legitimately break exact-t ties differently;
anything beyond ties is a bug).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/quant_sweep2.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=3):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    from blink.api import build_scene
    from blink.bvh.wide import build_wide
    from blink.config import get_config
    from blink.kernels.traverse_pallas import (
        _chunked_sah_trees,
        pad_chunks_uniform,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    size = 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=1_000_000,
    )
    scene = build_scene(cfg)
    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))
    tf = jnp.full((n,), 100.0, jnp.float32)

    results = {}
    for chunk_tris, wl in [(120_000, 32), (250_000, 24), (300_000, 24),
                           (250_000, 32)]:
        t0 = time.perf_counter()
        trees = _chunked_sah_trees(scene.triangles, 4, chunk_tris)
        chunks = [
            build_wide(b, wide_leaf=wl, quant=True, row_tables=False)
            for b in trees
        ]
        if len(chunks) > 1:
            chunks = pad_chunks_uniform(chunks)
        print(f"build ct={chunk_tris} wl={wl}: "
              f"{time.perf_counter()-t0:.1f}s chunks={len(chunks)} "
              f"smem={(chunks[0].child.nbytes+chunks[0].perm.nbytes+chunks[0].nbox.nbytes)/1024:.0f}K "
              f"vmem={chunks[0].trow.nbytes/2**20:.1f}M", flush=True)
        fc = jax.jit(lambda a, b, c=tuple(chunks): traverse_closest_wide(
            a, b, list(c)))
        fa = jax.jit(lambda a, b, t, c=tuple(chunks): traverse_anyhit_wide(
            a, b, list(c), t))
        try:
            dt_c = timeit(fc, o, d)
            t, p = jax.block_until_ready(fc(o, d))
            dt_a = timeit(fa, o, d, tf)
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue
        results[(chunk_tris, wl)] = (np.asarray(t), np.asarray(p))
        print(f"  ct={chunk_tris} wl={wl} closest {dt_c*1e3:7.2f} ms "
              f"{n/dt_c/1e6:7.2f} Mrays/s | anyhit {dt_a*1e3:7.2f} ms "
              f"{n/dt_a/1e6:7.2f} Mrays/s", flush=True)

    # --- mismatch characterization vs the 120k reference -------------------
    if (120_000, 32) in results:
        t0_, p0_ = results[(120_000, 32)]
        for k, (t1, p1) in results.items():
            if k == (120_000, 32):
                continue
            pm = p0_ != p1
            tm = np.abs(t0_ - t1) > 1e-5
            ties = pm & ~tm  # different prim, same t -> legitimate tie
            print(f"  vs {k}: prim mismatches={int(pm.sum())} "
                  f"(t-equal ties={int(ties.sum())}), "
                  f"t mismatches>1e-5={int(tm.sum())} "
                  f"max|dt|={float(np.abs(t0_-t1).max()):.3e}", flush=True)


if __name__ == "__main__":
    main()

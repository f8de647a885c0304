"""On-chip sweep: quantized-child WideBVH vs f32 baseline, across
wide_leaf (traversal leaf granularity) and chunk_tris (VMEM/SMEM-bound
chunk size). Motivation: leaf MT tests are ~72% of closest traversal
(wide_sweep.py 'skip' bisection) and shrink with leaf size, but smaller
leaves used to explode chunk count against the SMEM child-table budget —
quantization (12 B/child vs 32) is what pays for them.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/quant_sweep.py
"""
from __future__ import annotations

import sys
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

    tris_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris_n,
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

    ref = None
    # (chunk_tris, [wide_leaf...], quant)
    plans = [
        (120_000, [32], False),        # production baseline
        (120_000, [32, 16], True),     # isolate quant cost / leaf effect
        (250_000, [16, 24], True),
        (333_334, [16], True),
    ]
    for chunk_tris, leaves, quant in plans:
        t0 = time.perf_counter()
        trees = _chunked_sah_trees(scene.triangles, 4, chunk_tris)
        print(f"sah build chunk_tris={chunk_tris}: "
              f"{time.perf_counter()-t0:.1f}s  chunks={len(trees)}",
              flush=True)
        for wl in leaves:
            try:
                chunks = [
                    build_wide(b, wide_leaf=wl, quant=quant,
                               row_tables=False)
                    for b in trees
                ]
                if len(chunks) > 1:
                    chunks = pad_chunks_uniform(chunks)
            except Exception as e:
                print(f"  wl={wl} q={int(quant)} BUILD FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            smem_b = (chunks[0].child.nbytes + chunks[0].perm.nbytes
                      + (chunks[0].nbox.nbytes if quant else 0))
            vmem_b = chunks[0].trow.nbytes
            fc = jax.jit(lambda a, b, c=tuple(chunks): traverse_closest_wide(
                a, b, list(c)))
            fa = jax.jit(lambda a, b, t, c=tuple(chunks): traverse_anyhit_wide(
                a, b, list(c), t))
            try:
                dt_c = timeit(fc, o, d)
                t, p = jax.block_until_ready(fc(o, d))
                tag = ""
                if ref is None:
                    ref = (t, p)
                else:
                    same = bool(
                        np.array_equal(np.asarray(p), np.asarray(ref[1]))
                        and np.allclose(np.asarray(t), np.asarray(ref[0]),
                                        atol=1e-5)
                    )
                    tag = f" parity={same}"
                dt_a = timeit(fa, o, d, tf)
            except Exception as e:
                print(f"  wl={wl} q={int(quant)} RUN FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            print(
                f"  ct={chunk_tris} wl={wl:2d} q={int(quant)} "
                f"nc={len(chunks)} smem={smem_b/1024:.0f}K "
                f"vmem={vmem_b/2**20:.1f}M | closest {dt_c*1e3:7.2f} ms "
                f"{n/dt_c/1e6:7.2f} Mrays/s | anyhit {dt_a*1e3:7.2f} ms "
                f"{n/dt_a/1e6:7.2f} Mrays/s{tag}",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""On-chip probe: traversal-leaf granularity sweep + bf16 VPU throughput.

1. wide_leaf in {8,16,32}: the adaptive-collapse leaf cap trades leaf MT
   tests per visit against walk pops. Binary SAH chunks are built ONCE
   (the expensive part at 1M tris) and re-collapsed per variant.
2. bf16 vs f32 elementwise throughput in a Pallas kernel: decides whether
   a bf16 Moller-Trumbore prefilter can halve leaf-test cycles.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/leaf_probe.py [tris] [size]
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


def bf16_micro():
    """FMA-chain throughput: f32 vs bf16 on (256,128) tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 512  # chained multiply-adds

    def make(dtype):
        def kernel(x_ref, y_ref, o_ref):
            x = x_ref[...]
            y = y_ref[...]
            acc = x
            for _ in range(K):
                acc = acc * y + x
            o_ref[...] = acc

        n = (512, 128)
        x = jnp.ones(n, dtype)
        y = jnp.full(n, 0.5, dtype)
        f = jax.jit(lambda a, b: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(n, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        return f, x, y

    out = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        f, x, y = make(dtype)
        dt = timeit(f, x, y, reps=10)
        flops = 2 * K * x.size
        out[str(jnp.dtype(dtype))] = (dt, flops / dt / 1e9)
    for k, (dt, gf) in out.items():
        print(f"bf16micro {k:10s} {dt*1e6:8.1f} us  {gf:8.1f} GFLOP/s",
              flush=True)


def main() -> None:
    from blink.api import build_scene
    from blink.bvh.wide import build_wide
    from blink.config import get_config
    from blink.kernels.traverse_pallas import (
        _chunked_sah_trees,
        pad_chunks_uniform,
        traverse_closest_wide,
        CHUNK_TRIS,
    )
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    bf16_micro()

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    print(f"scene build: {time.perf_counter()-t0:.1f}s "
          f"tris={scene.n_triangles}", flush=True)

    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))

    # SMEM node budget caps chunk size per wide_leaf: n_wide ~ tris /
    # (wide_leaf fill * 7-ish); keep child+perm under ~0.8 MB.
    for wide_leaf, chunk in ((32, CHUNK_TRIS), (24, 100_000), (16, 70_000),
                             (8, 36_000)):
        t0 = time.perf_counter()
        binary = _chunked_sah_trees(scene.triangles, 4, chunk)
        chunks = pad_chunks_uniform(
            [build_wide(b, wide_leaf=wide_leaf) for b in binary]
        )
        bt = time.perf_counter() - t0
        smem_kb = (chunks[0].n_wide * 64 * 4 + chunks[0].n_wide * 8 * 4) / 1024
        print(f"wide_leaf={wide_leaf:2d} chunks={len(chunks)} "
              f"smem={smem_kb:.0f}K build={bt:5.1f}s", flush=True)
        if smem_kb > 950:
            print("  skip (SMEM)", flush=True)
            continue
        f = jax.jit(lambda a, b, c=tuple(chunks): traverse_closest_wide(
            a, b, list(c)))
        dt = timeit(f, o, d)
        print(f"  {dt*1e3:9.2f} ms  {n/dt/1e6:8.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

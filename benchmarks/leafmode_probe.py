"""On-chip A/B (round-5 forward campaign): leaf_mode 'row' vs 'group' at
the CURRENT tree shape (wl=44), at a chunk size whose tbat row-table fits
VMEM (tbat ~512 B/batch; 150k-tri chunks ~ 11 MB).

Motivation: benchmarks/union_sim2.py at production 340k/wl44 counts row
mode at 0.20x group mode's MT vec-ops (avg 2.6 needing rows/visit of 32;
1-2 needing rows per active group of 8) — the round-3 wash at 250k/wl32
does not hold at the coarser leaves. If the on-chip ratio confirms, the
production path gets an HBM-streamed tbat (DMA double-buffer) so row mode
runs at the 340k/3-pass chunking.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/leafmode_probe.py \
        [tris] [size] [chunk_tris] [wl]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=5):
    r = f(*a)
    chk = float(np.sum(np.asarray(r[0], np.float64)))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    chk2 = float(np.sum(np.asarray(r[0], np.float64)))
    assert chk == chk2, (chk, chk2)
    return dt


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    ct = int(sys.argv[3]) if len(sys.argv) > 3 else 150_000
    wl = int(sys.argv[4]) if len(sys.argv) > 4 else 44
    modes = sys.argv[5].split(",") if len(sys.argv) > 5 else ["group", "row"]
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    cam_o = np.asarray(scene.camera.origin, np.float32)
    t0 = time.perf_counter()
    bvh = build_chunked_wide(
        scene.triangles, chunk_tris=ct, wide_leaf=wl, quant=True,
        row_tables=True, order_from=cam_o,
    )
    tb = bvh[0].tbat
    print(f"build {time.perf_counter()-t0:.0f}s chunks={len(bvh)} "
          f"n_wide={bvh[0].n_wide} tbat={tb.shape} "
          f"({tb.size*4/1e6:.1f} MB) trow={bvh[0].trow.size*4/1e6:.1f} MB",
          flush=True)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))

    ref = None
    for mode in modes:
        f = jax.jit(lambda a, b, m=mode: traverse_closest_wide(
            a, b, bvh, leaf_mode=m))
        try:
            dt = timeit(f, o, d)
        except Exception as e:
            print(f"closest {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        t, p = jax.block_until_ready(f(o, d))
        if ref is None:
            ref = (np.asarray(t), np.asarray(p))
        else:
            pd = int((np.asarray(p) != ref[1]).sum())
            td = int((~np.isclose(np.asarray(t), ref[0], atol=1e-5)).sum())
            print(f"  parity vs group: pdiff={pd} tdiff={td}", flush=True)
        print(f"closest leaf_mode={mode:5s} {dt*1e3:8.2f} ms "
              f"{n/dt/1e6:7.2f} Mrays/s", flush=True)

    tf = jnp.full((n,), 100.0, jnp.float32)
    for mode in modes:
        f = jax.jit(lambda a, b, m=mode: traverse_anyhit_wide(
            a, b, bvh, tf, leaf_mode=m))
        try:
            dt = timeit(f, o, d)
        except Exception as e:
            print(f"anyhit {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        print(f"anyhit  leaf_mode={mode:5s} {dt*1e3:8.2f} ms "
              f"{n/dt/1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()

"""Chunk-merge sweep (round-4 forward campaign): can fewer chunk passes
buy frame time at constant SMEM budget?

The ROUND-3 production baseline walked 4 chunk trees per packet
(chunk_tris=250k, wide_leaf=32, quant); this sweep is what moved
production to 340k/44 (3 passes) — re-running it A/Bs against the OLD
constants, not current production. Every pass re-pays the near-root
walk and the
packet entry; SMEM caps the per-chunk child table, but n_wide scales
with chunk_tris / wide_leaf — so doubling BOTH holds the table size
while halving the number of passes, trading finer leaf granularity
(more delivered MT tests per ray) for walk amortization. block_reads
gates tri reads in 8-slot blocks on cnt, which matters once wide_leaf
is coarse (ungated unrolls pay wide_leaf row-rolls per visit even for
short adaptive leaves).

Cases are (chunk_tris, wide_leaf, block_reads). Parity is checked
against the round-3 baseline on prim ids (t to 1e-5): chunk
boundaries move between configs, so rare exact-t ties at instanced
geometry may flip prim — counted, not asserted.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/chunk_merge_sweep.py \
        [tris] [size]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=3):
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
    return dt, chk


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
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    cam_o = np.asarray(scene.camera.origin, np.float32)
    n = size * size
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, _ = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))
    tf = jnp.full((n,), 100.0, jnp.float32)

    cases = [
        (250_000, 32, False),   # round-3 production baseline
        (250_000, 32, True),    # isolate block_reads
        (500_000, 48, True),
        (500_000, 64, True),
        (334_000, 40, True),
        (1_000_000, 96, True),  # single pass, very coarse leaves
    ]
    ref = None
    for ct, wl, br in cases:
        t0 = time.perf_counter()
        try:
            bvh = build_chunked_wide(
                scene.triangles, chunk_tris=ct, wide_leaf=wl, quant=True,
                row_tables=False, block_reads=br, order_from=cam_o,
            )
        except Exception as e:
            print(f"ct={ct} wl={wl} br={br}  BUILD FAILED: {e!r:.120}",
                  flush=True)
            continue
        bt = time.perf_counter() - t0
        nw = bvh[0].n_wide
        smem_kb = (nw * (24 + 8 + 8) * 4 + bvh[0].max_stack * 4) / 1024
        tag = (f"ct={ct//1000}k wl={wl} br={int(br)} chunks={len(bvh)} "
               f"n_wide={nw} smem~{smem_kb:.0f}KB build={bt:.0f}s")
        try:
            f = jax.jit(lambda a, b, v=bvh: traverse_closest_wide(a, b, v))
            dt, chk = timeit(f, o, d)
        except Exception as e:
            print(f"{tag}  closest FAILED: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
            continue
        t_v, p_v = jax.block_until_ready(f(o, d))
        ptag = ""
        if ref is None:
            ref = (np.asarray(t_v), np.asarray(p_v))
        else:
            tdiff = ~np.isclose(np.asarray(t_v), ref[0], atol=1e-5)
            pdiff = np.asarray(p_v) != ref[1]
            ptag = f" tdiff={tdiff.sum()} pdiff={pdiff.sum()}"
        fa = jax.jit(lambda a, b, v=bvh: traverse_anyhit_wide(a, b, v, tf))
        dta, _ = timeit(fa, o, d)
        print(f"{tag}  closest {dt*1e3:7.2f} ms {n/dt/1e6:6.1f} Mrays/s  "
              f"anyhit {dta*1e3:7.2f} ms {n/dta/1e6:6.1f} Mrays/s{ptag}",
              flush=True)


if __name__ == "__main__":
    main()

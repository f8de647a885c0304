"""Kernel iteration lab: isolated primary-ray closest-hit timing on chip.

Measures ONLY the traversal kernel (no shading/NEE) so kernel changes give
clean signal. Usage:
    PYTHONPATH=src python benchmarks/kernel_lab.py [bunny|sponza] \
        [variant:tile ...]
e.g.  python benchmarks/kernel_lab.py bunny ordered:32x128 ordered_rg:64x64
Prints rays/s per (variant, tile) for the chunked traversal on
tile-permuted primary rays — the exact workload of the headline bench's
hot loop.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.traverse_pallas import (
        build_chunked_packed,
        build_chunked_wide,
        traverse_closest_chunked,
        traverse_closest_wide,
    )
    from blink.render.api import _tile_perm
    from blink.render.camera import generate_rays

    which = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    cases = sys.argv[2:] or ["ordered:32x128", "ordered_rg:32x128",
                             "ordered_rg:64x64"]
    size = {"bunny": 512, "sponza": 1024}[which]
    cfg = get_config(which).override(
        width=size, height=size, deterministic=True
    )
    scene = build_scene(cfg)
    print(f"scene={which} tris={scene.n_triangles} image={size}x{size}")

    chunk_cache = {}

    def get_chunks(leaf: int, wide: bool, binary_leaf: int = 4,
                   split_free: bool = True, block_reads: bool = True):
        key = (leaf, wide, binary_leaf, split_free, block_reads)
        if key not in chunk_cache:
            t0 = time.perf_counter()
            if wide:
                chunk_cache[key] = build_chunked_wide(
                    scene.triangles, leaf_size=binary_leaf, wide_leaf=leaf,
                    split_free=split_free, block_reads=block_reads,
                )
            else:
                chunk_cache[key] = build_chunked_packed(
                    scene.triangles, leaf_size=leaf
                )
            print(
                f"build{key}: {time.perf_counter() - t0:.1f}s, "
                f"{len(chunk_cache[key])} chunks"
            )
        return chunk_cache[key]

    key = jax.random.key(0)
    o0, d0, _ = generate_rays(scene.camera, size, size, key, 0, False)

    ref = None
    for case in cases:
        # wide:64x64:l32[:m][:u][:bN]  m=must-only collapse (no free-slot
        # splitting), u=unrolled leaf reads (no cnt-gated blocks),
        # bN=binary SAH leaf N (default 4).
        parts = case.split(":")
        variant, tile_s = parts[0], parts[1]
        leaf = int(parts[2][1:]) if len(parts) > 2 else 16
        split_free, block_reads, binary_leaf = True, True, 4
        for f in parts[3:]:
            if f == "m":
                split_free = False
            elif f == "u":
                block_reads = False
            elif f.startswith("b"):
                binary_leaf = int(f[1:])
        chunks = get_chunks(
            leaf, variant == "wide", binary_leaf, split_free, block_reads
        )
        th, tw = (int(x) for x in tile_s.split("x"))
        perm = _tile_perm(size, size, (th, tw))
        o, d = o0[perm], d0[perm]
        if variant == "wide":
            fn = jax.jit(lambda o, d, ch: traverse_closest_wide(o, d, ch))
        else:
            fn = jax.jit(
                lambda o, d, ch, v=variant: traverse_closest_chunked(
                    o, d, ch, variant=v
                )
            )
        t0 = time.perf_counter()
        t, prim = jax.block_until_ready(fn(o, d, chunks))
        compile_s = time.perf_counter() - t0
        n = o.shape[0]
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            t, prim = fn(o, d, chunks)
        jax.block_until_ready((t, prim))
        dt = (time.perf_counter() - t0) / reps
        hit = float(jnp.mean(prim >= 0))
        # Cross-variant correctness: same hits after undoing the perm.
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        pr_img = np.asarray(prim)[inv]
        ok = ""
        if ref is None:
            ref = pr_img
        else:
            ok = f"  prim_match={float((pr_img == ref).mean()):.4f}"
        print(
            f"{case:24s} {n / dt / 1e6:7.2f} Mrays/s  wall={dt * 1e3:6.1f}ms"
            f"  hit={hit:.3f}  compile={compile_s:.0f}s{ok}"
        )


if __name__ == "__main__":
    main()

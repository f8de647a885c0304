"""Config-4 (path depth 4, 16 spp, 512², 1M tris) A/B matrix — round-5
(VERDICT r4 ask #4). Variants target the INCOHERENT bounce traversal that
dominates the frame:

  sb4         production spp interleave (4 samples/pixel per cull group)
  sb16        16 samples/pixel per group: a 1024-ray cull group then
              covers 64 hit-point clusters instead of 256 at bounce>=1
  sb16+comp   plus wavefront compaction (octant+cell re-sort per bounce)
  sb4+comp    the round-4 measured pair, reproduced for reference

Radiance is bit-identical across sb/compact variants ONLY for matching
sb (RNG keys are per-(pixel,sample)); across sb the accumulation order
differs — checksums are reported per variant, equal for compact on/off.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/config4_probe.py [tris] [size] [spp]
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np


def timeit(f, *a, reps=2):
    r = f(*a)
    chk = float(np.sum(np.asarray(r, np.float64)))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    return dt, chk


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.api import _render_jit

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    base = get_config("sponza").override(
        width=size, height=size, spp=spp, backend="pallas",
        sponza_tris=tris,
    )
    scene = build_scene(base)
    backend = make_backend("pallas", scene)
    samples = size * size * spp
    print(f"tris={scene.n_triangles} {size}^2 spp={spp} "
          f"integrator={base.integrator} depth={base.max_depth}", flush=True)

    for name, kw in (
        ("sb4", dict(spp_block=4)),
        ("sb16", dict(spp_block=16)),
        ("sb16+comp", dict(spp_block=16, compact=True)),
        ("sb4+comp", dict(spp_block=4, compact=True)),
    ):
        cfg = base.override(**kw)
        try:
            dt, chk = timeit(lambda c=cfg: _render_jit(scene, c, backend))
        except Exception as e:
            print(f"{name:10s} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        print(f"{name:10s} {dt:7.3f} s  {samples/dt/1e3:8.1f} k samples/s  "
              f"chk={chk:.6g}", flush=True)


if __name__ == "__main__":
    main()

"""Combined dead-lane-cull + Russian-roulette A/B on the literal config 4
(round 5). One process, sequential variants (each config-4 retrace costs
minutes on axon's remote compile — this probe amortizes scene/backend
build and keeps every comparison same-process):

  cull_off        CULL_DEAD=False, rr=0   (round-4 production)
  cull_on         CULL_DEAD=True,  rr=0   (exact: checksum must MATCH off)
  cull_on_rr1     CULL_DEAD=True,  rr=1   (RR gates bounces 2..3; image
                                           mean must agree ~1e-3 — the
                                           estimator changes, the
                                           expectation does not)

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/cull_rr_probe.py [tris] [size] [spp] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import numpy as np


def timeit(f, reps=2):
    t0 = time.perf_counter()
    r = f()
    jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    a = np.asarray(r, np.float64)
    chk, mean = float(a.sum()), float(a.mean())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), chk, mean, compile_s


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render import integrators
    from blink.render.api import _render_jit

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    base = get_config("sponza").override(
        width=size, height=size, spp=spp, backend="pallas",
        sponza_tris=tris,
    )
    scene = build_scene(base)
    backend = make_backend("pallas", scene)
    samples = size * size * spp
    print(f"tris={scene.n_triangles} {size}^2 spp={spp} depth={base.max_depth} "
          f"spp_block={base.spp_block} compact={base.compact}", flush=True)

    out = {}
    for name, cull, rr in (
        ("cull_off", False, 0),
        ("cull_on", True, 0),
        ("cull_on_rr1", True, 1),
    ):
        integrators.CULL_DEAD = cull
        _render_jit.clear_cache()
        cfg = base.override(rr_start=rr)
        dt, chk, mean, comp = timeit(
            lambda c=cfg: _render_jit(scene, c, backend), reps
        )
        out[name] = (dt, chk, mean)
        print(f"{name:12s} {dt:7.3f} s  {samples/dt/1e3:8.1f} k samples/s  "
              f"chk={chk:.8g} mean={mean:.6f} (compile {comp:.0f}s)",
              flush=True)
    integrators.CULL_DEAD = True

    off, on = out["cull_off"], out["cull_on"]
    exact = "EXACT" if off[1] == on[1] else "CHECKSUM MISMATCH"
    print(f"\ncull: {off[0]/on[0]:.3f}x [{exact}]", flush=True)
    if "cull_on_rr1" in out:
        rr1 = out["cull_on_rr1"]
        print(f"rr1 : {off[0]/rr1[0]:.3f}x vs off, {on[0]/rr1[0]:.3f}x vs "
              f"cull_on; mean {rr1[2]:.6f} vs {on[2]:.6f} "
              f"(rel {abs(rr1[2]-on[2])/max(on[2],1e-9):.4f})", flush=True)


if __name__ == "__main__":
    main()

"""Timing sanity check on the axon emulator: does repeating a jitted call
with IDENTICAL arguments return faster than with varying arguments?

If yes, the emulator memoizes (executable, args) -> result server-side and
every equal-args benchmark in this repo overstates throughput; benches must
vary an input per rep (e.g. the sample index / key).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/timing_sanity.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.api import render_image

    size = 512
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd(scene, cfg, backend, eps):
        # eps perturbs a differentiable leaf so each call is a genuinely
        # new computation (defeats any server-side result memoization).
        s = scene.replace(
            materials=scene.materials.replace(
                albedo=scene.materials.albedo + eps
            )
        )
        return render_image(s, cfg, backend)

    z = jnp.float32(0.0)
    jax.block_until_ready(fwd(scene, cfg, backend, z))

    # identical args, blocked per call
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(scene, cfg, backend, z))
        ts.append(time.perf_counter() - t0)
    print("same-args blocked  :", [f"{t*1e3:8.2f}" for t in ts], "ms",
          flush=True)

    # varying args, blocked per call
    ts = []
    for i in range(4):
        eps = jnp.float32(1e-9 * (i + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(scene, cfg, backend, eps))
        ts.append(time.perf_counter() - t0)
    print("vary-args blocked  :", [f"{t*1e3:8.2f}" for t in ts], "ms",
          flush=True)

    # varying args, pipelined
    t0 = time.perf_counter()
    r = None
    for i in range(4):
        eps = jnp.float32(1e-9 * (i + 5))
        r = fwd(scene, cfg, backend, eps)
    jax.block_until_ready(r)
    print(f"vary-args pipelined: {(time.perf_counter()-t0)/4*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

"""Backward-pass cost bisection (VERDICT r1 #3: fwd+bwd is 12x off fwd).

Times value_and_grad of the direct-lighting pixel-MSE on the sponza-class
scene per parameter set, against the forward render. Uses the binary
ordered_rg kernel (fast compile); the traversal is a stop-gradient
topology oracle either way, so the backward structure under test
(refine/shading transposes: gathers -> scatter-adds) is the production
one. Run on the TPU: PYTHONPATH=src python benchmarks/bwd_probe.py [tris]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene, extract_params, loss_fn
    from blink.config import get_config
    from blink.kernels.api import Backend
    from blink.kernels.traverse_pallas import build_chunked_packed
    from blink.render.api import render_image

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    size = 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = Backend(
        name="pallas", bvh=build_chunked_packed(scene.triangles)
    )
    target = jnp.zeros((size, size, 3), jnp.float32)
    n = size * size

    def timeit(f, *a):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 3, compile_s

    fwd = jax.jit(lambda s: render_image(s, cfg, backend))
    dt, cs = timeit(fwd, scene)
    print(f"fwd                    {dt*1e3:8.1f}ms  {n/dt/1e6:6.2f} Mrays/s"
          f"  compile={cs:.0f}s", flush=True)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def vg(params, scene, cfg, target):
        return jax.value_and_grad(loss_fn)(params, scene, cfg, backend, target)

    for names in [
        ("albedo",),
        ("emission",),
        ("textures",),
        ("tri_verts",),
        ("cam_origin",),
        ("albedo", "emission", "tri_verts"),
    ]:
        params = extract_params(scene, names)
        dt, cs = timeit(vg, params, scene, cfg, target)
        print(f"vg {','.join(names):20s} {dt*1e3:8.1f}ms  "
              f"{n/dt/1e6:6.2f} Mrays/s  compile={cs:.0f}s", flush=True)


if __name__ == "__main__":
    main()

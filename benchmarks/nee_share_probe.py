"""A/B the row-shared NEE light sampling (integrators.NEE_SHARE_ROW) on
the full 512^2 direct frame, 1M tris: forward render and value_and_grad
(albedo+emission+tri_verts — the bench fwd_bwd shape).

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/nee_share_probe.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=5):
    r = f(*a)
    chk = float(np.sum(np.asarray(jax.tree_util.tree_leaves(r)[0], np.float64)))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps, chk


def main() -> None:
    sys.path.insert(0, "src")
    import blink.render.integrators as integ
    from blink.api import build_scene, extract_params, loss_fn
    from blink.config import get_config
    from blink.kernels.api import make_backend

    size = 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas",
    )
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    print(f"build: {time.perf_counter()-t0:.1f}s", flush=True)
    target = jnp.zeros((size, size, 3), jnp.float32)
    p_geo = extract_params(scene, ("albedo", "emission", "tri_verts"))

    import functools
    for share in (False, True):
        integ.NEE_SHARE_ROW = share

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def fwd(params, scene, cfg, backend, target, _s=share):
            return loss_fn(params, scene, cfg, backend, target)

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def vg(params, scene, cfg, backend, target, _s=share):
            return jax.value_and_grad(loss_fn)(params, scene, cfg, backend,
                                               target)

        dt_f, chk_f = timeit(fwd, p_geo, scene, cfg, backend, target)
        dt_g, chk_g = timeit(vg, p_geo, scene, cfg, backend, target)
        rays = size * size
        print(f"share={share}: fwd {dt_f*1e3:7.2f} ms ({rays/dt_f/1e6:6.2f} "
              f"Mrays/s)  fwd+bwd {dt_g*1e3:7.2f} ms ({rays/dt_g/1e6:6.2f} "
              f"Mrays/s)  ratio {dt_g/dt_f:.2f}  chk={chk_f:.5e}", flush=True)


if __name__ == "__main__":
    main()

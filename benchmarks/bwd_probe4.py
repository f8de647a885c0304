"""Round-5 NEE/dirty-mode backward bisection (follow-up to bwd_probe3,
which localized ~200 of vg_geo's 266 ms at 1024² to the NEE term and
+80 ms to the dirty-forward narrow gathers).

Builds li_direct by hand (rays -> intersect -> refine -> emission + NEE)
so estimator pieces can be swapped per variant:

  fwd_geo        forward, dirty refine (narrow gathers), with NEE
  fwd_nolit      forward, dirty refine, NEE dropped
  vg_geo         value_and_grad of MSE, params albedo+emission+tri_verts
  vg_nolit       same, NEE dropped
  vg_sever       NEE kept, but its GEOMETRY inputs (p, n, t) stop-grad'ed
                 — isolates the NEE-geometry backward chain
  vg_remat       NEE wrapped in jax.checkpoint (recompute in backward
                 instead of saving residuals)
  vg_table       dirty geometry via an IN-JIT rebuilt shade table
                 (differentiable (T,16) pack + one wide row gather)
                 instead of per-ray narrow gathers
  vg_det         deterministic NEE (per-light unroll)

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/bwd_probe4.py [tris] [size]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, reps=4):
    r = f(*a)
    leaf = jax.tree_util.tree_leaves(r)[0]
    chk = float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    leaf = jax.tree_util.tree_leaves(r)[0]
    chk2 = float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    assert chk == chk2, (chk, chk2)
    return dt


def main() -> None:
    sys.path.insert(0, "src")
    from blink.api import build_scene, extract_params, merge_params
    from blink.config import get_config
    from blink.diff.hitrefine import HitGeom, refine
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import nee_direct

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    target = jnp.zeros((n, 3), jnp.float32)
    p_geo = extract_params(scene, ("albedo", "emission", "tri_verts"))
    print(f"tris={scene.n_triangles} size={size}", flush=True)

    def radiance(params, variant):
        s = merge_params(scene, params)  # sets geom_dirty for tri_verts
        o, d, keys = generate_rays(s.camera, size, size, key, 0, False,
                                   pixel_id=pid)
        hit = backend.intersect(o, d, s)
        if variant == "table":
            from blink.scene.shade import pack_tri_shade

            geom = refine(o, d, hit, s, shade=pack_tri_shade(s.triangles))
        else:
            geom = refine(o, d, hit, s, shade=None)  # dirty narrow gathers
        if variant == "nolit":
            return geom.emission
        g_in = geom
        if variant == "sever":
            sg = jax.lax.stop_gradient
            g_in = HitGeom(
                valid=geom.valid, t=sg(geom.t), p=sg(geom.p), n=sg(geom.n),
                uv=sg(geom.uv), mat=geom.mat, albedo=geom.albedo,
                emission=geom.emission,
            )
        det = variant == "det"
        if variant == "remat":
            nee = jax.checkpoint(
                lambda gi, ss: nee_direct(ss, gi, keys, backend, 0, False)
            )(g_in, s)
        else:
            nee = nee_direct(s, g_in, keys, backend, 0, det)
        return geom.emission + nee

    def loss(params, variant):
        li = radiance(params, variant)
        return jnp.mean((li - target) ** 2)

    for name, variant, grad in (
        ("fwd_geo", "base", False),
        ("fwd_nolit", "nolit", False),
        ("vg_geo", "base", True),
        ("vg_nolit", "nolit", True),
        ("vg_sever", "sever", True),
        ("vg_remat", "remat", True),
        ("vg_table", "table", True),
        ("vg_det", "det", True),
    ):
        if grad:
            f = jax.jit(lambda p, v=variant: jax.value_and_grad(
                lambda pp: loss(pp, v))(p))
        else:
            f = jax.jit(lambda p, v=variant: loss(p, v))
        try:
            dt = timeit(lambda: f(p_geo))
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        print(f"{name:12s} {dt*1e3:8.2f} ms   {n/dt/1e6:6.2f} Mrays/s",
              flush=True)


if __name__ == "__main__":
    main()

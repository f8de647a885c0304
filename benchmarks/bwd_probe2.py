"""Backward-pass bisection on the flagship workload (1M tris, 512^2,
direct): name the dominant term of the bwd/fwd overhang (VERDICT r2 #4).

Stages timed (all jitted, steady-state):
  fwd            render_image forward only
  vg_mat         value_and_grad, albedo+emission (fixed-topology, shade
                 table precomputed)
  vg_geo         value_and_grad, +tri_verts (geom_dirty: narrow-gather
                 refine; bwd adds one batched (3N,)->(V,3) segment_sum)
  fwd_dirty      forward only but with geom_dirty=True (isolates the
                 narrow-gather FORWARD cost from the bwd cost)
  refine_vg      value_and_grad of a refine-only loss with traversal
                 hoisted OUT (precomputed hit): the diff layer alone
  nee_vg         value_and_grad of the NEE term with hit fixed: shadow
                 traversal + shading, fwd+bwd

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/bwd_probe2.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp


def timeit(f, *a, reps=3):
    # Materialize a host-side checksum outside the timed region: one run
    # of this probe returned physically-impossible ~0.15 ms frame times
    # (block_until_ready returned instantly; a later identical run showed
    # the real ~155 ms — transient relay state). The checksum forces a
    # full device->host transfer so a silently-broken block shows up as
    # an absurd checksum or a hang here rather than as a fake timing.
    import numpy as np

    r0 = f(*a)
    chk = float(np.sum(np.abs(np.asarray(jax.tree_util.tree_leaves(r0)[0],
                                         dtype=np.float64))))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    return dt, chk


def main() -> None:
    from blink.api import build_scene, extract_params, loss_fn, merge_params
    from blink.config import get_config
    from blink.diff.hitrefine import refine
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, render_image, tile_pixel_ids
    from blink.render.camera import generate_rays
    from blink.render.integrators import nee_direct

    tris_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris_n,
    )
    t0 = time.perf_counter()
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    print(f"build: {time.perf_counter()-t0:.1f}s chunks={len(backend.bvh)}",
          flush=True)
    target = jnp.zeros((size, size, 3), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd(scene, cfg, backend):
        return render_image(scene, cfg, backend)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def vg(params, scene, cfg, backend, target):
        return jax.value_and_grad(loss_fn)(params, scene, cfg, backend,
                                           target)

    p_mat = extract_params(scene, ("albedo", "emission"))
    p_geo = extract_params(scene, ("albedo", "emission", "tri_verts"))
    dt_f, ck = timeit(lambda: fwd(scene, cfg, backend))
    print(f"fwd          {dt_f*1e3:8.2f} ms  chk={ck:.3e}", flush=True)
    dt_fd, ck = timeit(lambda: fwd(scene.replace(geom_dirty=True), cfg, backend))
    print(f"fwd_dirty    {dt_fd*1e3:8.2f} ms  (narrow-gather refine fwd) "
          f"chk={ck:.3e}", flush=True)
    dt_m, ck = timeit(lambda: vg(p_mat, scene, cfg, backend, target))
    print(f"vg_mat       {dt_m*1e3:8.2f} ms  ratio={dt_m/dt_f:.2f} "
          f"chk={ck:.3e}", flush=True)
    dt_g, ck = timeit(lambda: vg(p_geo, scene, cfg, backend, target))
    print(f"vg_geo       {dt_g*1e3:8.2f} ms  ratio={dt_g/dt_f:.2f} "
          f"chk={ck:.3e}", flush=True)

    # --- diff layer alone: hit topology precomputed outside the vjp ------
    key = jax.random.key(0)
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, pkeys = jax.block_until_ready(jax.jit(
        lambda s: generate_rays(s.camera, size, size, key, 0, False,
                                pixel_id=pid))(scene))
    hit = jax.block_until_ready(
        jax.jit(lambda o, d, s, b: b.intersect(o, d, s))(o, d, scene,
                                                         backend))

    def refine_loss(params):
        s = merge_params(scene, params)
        g = refine(o, d, hit, s, shade=None)
        return jnp.sum(g.p) + jnp.sum(g.albedo)

    rvg = jax.jit(jax.value_and_grad(refine_loss))
    dt_r, ck = timeit(lambda: rvg(p_geo))
    print(f"refine_vg    {dt_r*1e3:8.2f} ms  (diff layer alone, geo params) "
          f"chk={ck:.3e}", flush=True)

    def nee_loss(params):
        s = merge_params(scene, params)
        g = refine(o, d, hit, s, shade=None)
        return jnp.sum(nee_direct(s, g, pkeys, backend, 0, False))

    nvg = jax.jit(jax.value_and_grad(nee_loss))
    dt_n, ck = timeit(lambda: nvg(p_geo))
    print(f"nee_vg       {dt_n*1e3:8.2f} ms  (NEE incl shadow anyhit fwd) "
          f"chk={ck:.3e}", flush=True)


if __name__ == "__main__":
    main()

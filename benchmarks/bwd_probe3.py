"""Round-5 backward bisection at the HEADLINE size (1024², 1M tris,
production pallas direct path) — where does the fwd+bwd geometry delta go?

Stages:
  fwd_mat      loss_fn forward, materials params (clean shade table)
  fwd_geo      loss_fn forward, +tri_verts (geom_dirty: narrow gathers)
  vg_mat       value_and_grad, albedo+emission
  vg_geo       value_and_grad, albedo+emission+tri_verts
  vg_geo_nolit value_and_grad geo on a light-less scene (severs the whole
               NEE term: isolates refine/BRDF backward from NEE backward)
  segsum       isolated (3N,3)->(V,3) segment_sum at the exact backward
               shape of the fused vertex VJP (diff.hitrefine)
  gather3      isolated forward triple vertex gather (its cost pairs with
               segsum to give the full narrow-gather round trip)

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/bwd_probe3.py [tris] [size]
"""
from __future__ import annotations

import functools
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
    from blink.api import build_scene, extract_params, loss_fn
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.scene.scene import Lights

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, integrator="direct",
        backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    target = jnp.zeros((size, size, 3), jnp.float32)
    n = size * size
    print(f"tris={scene.n_triangles} verts={scene.triangles.verts.shape[0]} "
          f"size={size}", flush=True)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def fwd(params, scene, cfg, backend, target):
        return loss_fn(params, scene, cfg, backend, target)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def vg(params, scene, cfg, backend, target):
        return jax.value_and_grad(loss_fn)(params, scene, cfg, backend,
                                           target)

    p_mat = extract_params(scene, ("albedo", "emission"))
    p_geo = extract_params(scene, ("albedo", "emission", "tri_verts"))

    rows = {}
    for name, f, p, s in (
        ("fwd_mat", fwd, p_mat, scene),
        ("fwd_geo", fwd, p_geo, scene),
        ("vg_mat", vg, p_mat, scene),
        ("vg_geo", vg, p_geo, scene),
        ("vg_geo_nolit", vg, p_geo, scene.replace(lights=Lights(
            kind=jnp.zeros((0,), jnp.int32),
            prim=jnp.zeros((0,), jnp.int32)))),
    ):
        try:
            dt = timeit(lambda f=f, p=p, s=s: f(p, s, cfg, backend, target))
        except Exception as e:
            print(f"{name:14s} FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        rows[name] = dt
        print(f"{name:14s} {dt*1e3:8.2f} ms   {n/dt/1e6:6.2f} Mrays/s",
              flush=True)

    # Isolated fused-vertex-VJP shapes.
    V = scene.triangles.verts.shape[0]
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, V, size=(3 * n,)), jnp.int32)
    val = jnp.asarray(rng.normal(size=(3 * n, 3)), jnp.float32)
    seg = jax.jit(
        lambda v, i: jax.ops.segment_sum(v, i, num_segments=V)
    )
    dt = timeit(seg, val, idx)
    print(f"{'segsum':14s} {dt*1e3:8.2f} ms   (3N={3*n} -> V={V})",
          flush=True)
    verts = scene.triangles.verts
    i3 = jnp.asarray(rng.integers(0, V, size=(n, 3)), jnp.int32)
    g3 = jax.jit(lambda v, i: (v[i[:, 0]], v[i[:, 1]], v[i[:, 2]]))
    dt = timeit(g3, verts, i3)
    print(f"{'gather3':14s} {dt*1e3:8.2f} ms", flush=True)

    if "vg_geo" in rows and "fwd_mat" in rows:
        print(f"bwd_over_fwd_geometry = {rows['vg_geo']/rows['fwd_mat']:.2f}",
              flush=True)


if __name__ == "__main__":
    main()

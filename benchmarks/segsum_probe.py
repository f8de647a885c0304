"""Round-5: vertex-gradient scatter (segment_sum) layout variants at the
backward's exact shape — (3N,3) -> (V,3) with N=1024², V~500k — using
REALISTIC indices (the actual hit triangles of the production render, so
index locality matches the real backward; bwd_probe3 measured random
indices 263 ms vs ~113 ms in context).

Variants:
  base        jax.ops.segment_sum (3N,3) -> (V,3)        [production]
  scalar3     three (3N,) -> (V,) component segment_sums
  pad8        values padded to (3N,8) -> (V,8)
  stage2      per-TRIANGLE reduction first ((N,9) segment_sum over hit
              prim -> (T,9)), then STATIC-incidence gathers: grad[v] =
              sum_j corner_vals[inc[v,j]] with inc precomputed host-side
              (degree-padded) — turns the vertex scatter into D gathers
  stage2s     stage2 with the first stage over SORTED-by-tile hit ids
              (indices_are_sorted hint)

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/segsum_probe.py [tris] [size]
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
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = get_config("sponza").override(
        width=size, height=size, spp=1, backend="pallas", sponza_tris=tris,
    )
    scene = build_scene(cfg)
    backend = make_backend("pallas", scene)
    n = size * size
    key = jax.random.key(0)
    pid = tile_pixel_ids(size, size, *_tile_shape(size, size))
    o, d, _ = jax.jit(lambda s: generate_rays(
        s.camera, size, size, key, 0, False, pixel_id=pid))(scene)
    hit = jax.jit(lambda a, b, s: backend.intersect(a, b, s))(o, d, scene)
    tp = np.asarray(jnp.clip(hit.prim, 0, scene.n_triangles - 1))
    idx_np = np.asarray(scene.triangles.idx)
    V = scene.triangles.verts.shape[0]
    T = scene.n_triangles
    i = idx_np[tp]  # (N,3) vertex ids per ray
    print(f"N={n} T={T} V={V} unique_hit_tris={len(np.unique(tp))}",
          flush=True)

    rng = np.random.default_rng(0)
    g = [jnp.asarray(rng.normal(size=(n, 3)), jnp.float32) for _ in range(3)]
    idx3 = jnp.asarray(
        np.concatenate([i[:, 0], i[:, 1], i[:, 2]]), jnp.int32)
    tpj = jnp.asarray(tp, jnp.int32)

    def base(g0, g1, g2):
        val = jnp.concatenate([g0, g1, g2], axis=0)
        return jax.ops.segment_sum(val, idx3, num_segments=V)

    dt = timeit(jax.jit(base), *g)
    ref = np.asarray(jax.jit(base)(*g), np.float64)
    print(f"base      {dt*1e3:8.2f} ms", flush=True)

    def scalar3(g0, g1, g2):
        val = jnp.concatenate([g0, g1, g2], axis=0)
        outs = [jax.ops.segment_sum(val[:, c], idx3, num_segments=V)
                for c in range(3)]
        return jnp.stack(outs, axis=-1)

    dt = timeit(jax.jit(scalar3), *g)
    print(f"scalar3   {dt*1e3:8.2f} ms", flush=True)

    def pad8(g0, g1, g2):
        val = jnp.concatenate([g0, g1, g2], axis=0)
        val = jnp.pad(val, ((0, 0), (0, 5)))
        return jax.ops.segment_sum(val, idx3, num_segments=V)[:, :3]

    dt = timeit(jax.jit(pad8), *g)
    print(f"pad8      {dt*1e3:8.2f} ms", flush=True)

    # ---- stage2: per-tri reduce then static incidence gathers --------
    t0 = time.perf_counter()
    corner = np.concatenate(
        [idx_np[:, 0], idx_np[:, 1], idx_np[:, 2]])  # (3T,) vert of corner
    order = np.argsort(corner, kind="stable")
    sc = corner[order]
    starts = np.searchsorted(sc, np.arange(V))
    ends = np.searchsorted(sc, np.arange(V) + 1)
    deg = ends - starts
    D = int(deg.max())
    inc = np.full((V, D), 3 * T, np.int64)  # pad -> zero row
    for j in range(D):
        m = deg > j
        inc[m, j] = order[starts[m] + j]
    inc_j = jnp.asarray(inc, jnp.int32)
    print(f"incidence build {time.perf_counter()-t0:.1f}s  max_degree={D} "
          f"mean_degree={deg.mean():.2f}", flush=True)

    def stage2(g0, g1, g2, sort_first):
        tpk = tpj
        if sort_first:
            perm = jnp.argsort(tpj)
            tpk = tpj[perm]
            g0l, g1l, g2l = g0[perm], g1[perm], g2[perm]
        else:
            g0l, g1l, g2l = g0, g1, g2
        pertri = jnp.concatenate(
            [
                jax.ops.segment_sum(g0l, tpk, num_segments=T,
                                    indices_are_sorted=sort_first),
                jax.ops.segment_sum(g1l, tpk, num_segments=T,
                                    indices_are_sorted=sort_first),
                jax.ops.segment_sum(g2l, tpk, num_segments=T,
                                    indices_are_sorted=sort_first),
            ],
            axis=0,
        )  # (3T, 3) corner-major [v0 block; v1 block; v2 block]
        vals = jnp.concatenate(
            [pertri, jnp.zeros((1, 3), jnp.float32)], axis=0)
        out = jnp.zeros((V, 3), jnp.float32)
        for j in range(D):
            out = out + vals[inc_j[:, j]]
        return out

    for name, sf in (("stage2", False), ("stage2s", True)):
        f = jax.jit(lambda a, b, c, s=sf: stage2(a, b, c, s))
        dt = timeit(f, *g)
        out = np.asarray(f(*g), np.float64)
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
        print(f"{name:9s} {dt*1e3:8.2f} ms  rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()

"""TLAS vs flat-chunks measurement on the instanced config-4 scene
(VERDICT r2 #5: BASELINE.json:10 says "2-level BVH" — either route the
flagship through the TLAS or commit the measurement that justifies
Morton-chunked flat SAH as the TPU-native 2-level equivalent).

Measures, on the SAME instanced sponza-class geometry
(scene.builders.sponza_scene_instanced):
  - two-level walk (bvh.tlas.traverse_two_level): rays/s + structure bytes
    (per-object BLAS stored ONCE + instance transforms);
  - production path (flattened world-space tris -> chunked wide SAH,
    kernels.traverse_pallas on TPU / kernels.traverse pure-JAX on CPU):
    rays/s + structure bytes;
  - exact hit parity between the two.

Run: PYTHONPATH=/root/.axon_site:src python -m blink.benchmarks.tlas_probe
     [--tris N] [--rays N] [--platform cpu]
The result table is committed to docs/PARITY.md ("2-level BVH").
"""
from __future__ import annotations

import argparse
import json
import time


def _nbytes(tree) -> int:
    import jax

    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "nbytes")
    )


def _time(fn, reps: int = 3) -> float:
    import jax

    fn()  # compile
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=200_000)
    ap.add_argument("--rays", type=int, default=65_536)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from blink.bvh.tlas import build_two_level, traverse_two_level
    from blink.scene.builders import sponza_scene_instanced

    objects, obj_of_inst, o2w, scene = sponza_scene_instanced(args.tris)
    n_tris = scene.n_triangles
    n_inst = len(obj_of_inst)

    # Camera-ish ray batch over the hall (deterministic).
    rng = np.random.default_rng(3)
    n = args.rays
    o = jnp.asarray(
        np.tile([0.0, 3.0, 38.0], (n, 1))
        + rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32
    )
    d = rng.standard_normal((n, 3))
    d[:, 2] -= 1.5  # look down the hall
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)

    acc = build_two_level(objects, obj_of_inst, o2w)
    tlas_bytes = _nbytes(acc)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from blink.kernels.traverse_pallas import (
            build_chunked_wide,
            traverse_closest_wide,
        )

        chunks = build_chunked_wide(scene.triangles)
        flat_bytes = _nbytes(chunks)
        flat_fn = jax.jit(
            lambda o, d: traverse_closest_wide(o, d, chunks)
        )
        flat_name = "chunked-wide-pallas"
    else:
        from blink.bvh import build_flat_bvh
        from blink.kernels.traverse import traverse_closest

        flat = build_flat_bvh(scene.triangles, leaf_size=8)
        flat_bytes = _nbytes(flat)
        flat_fn = jax.jit(lambda o, d: traverse_closest(o, d, flat))
        flat_name = "flat-sah-purejax"

    tlas_fn = jax.jit(lambda o, d: traverse_two_level(o, d, acc))

    t_fl, p_fl = flat_fn(o, d)
    t_tl, p_tl = tlas_fn(o, d)
    hit_fl = np.asarray(p_fl) >= 0
    hit_tl = np.asarray(p_tl) >= 0
    parity = bool(
        (hit_fl == hit_tl).all()
        and np.allclose(
            np.asarray(t_fl)[hit_fl], np.asarray(t_tl)[hit_fl],
            rtol=1e-5, atol=1e-5,
        )
    )

    dt_flat = _time(lambda: flat_fn(o, d))
    dt_tlas = _time(lambda: tlas_fn(o, d))
    out = {
        "platform": jax.default_backend(),
        "n_triangles": int(n_tris),
        "n_instances": int(n_inst),
        "n_rays": n,
        "parity_exact_hits": parity,
        "hit_fraction": float(hit_fl.mean()),
        "two_level": {
            "rays_per_s": n / dt_tlas,
            "structure_mb": tlas_bytes / 1e6,
        },
        "flat": {
            "name": flat_name,
            "rays_per_s": n / dt_flat,
            "structure_mb": flat_bytes / 1e6,
        },
        "flat_over_tlas_speed": dt_tlas / dt_flat,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Host-side (numpy) simulation of the wide-packet walk's leaf-test
economics: for the production chunked wide BVH and the production tile
order, count

  - leaf TESTS DELIVERED per ray when leaves are gated per GROUP
    (any-ray-needs semantics at the kernel's 1024-ray cull granularity),
  - leaf tests NEEDED by single rays walked alone (sampled),

so the sharing-waste factor (delivered/needed) is separated from tree
quality. Decides where the next traversal speedup must come from:
spatial-split trees shrink BOTH numbers; finer culling (impossible below
one vreg) would only shrink the first.

Run (CPU, ~1 min at 200k tris): python benchmarks/union_sim.py [tris] [size]
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.bvh.wide import build_wide
    from blink.config import get_config
    from blink.kernels.traverse_pallas import (
        CHUNK_TRIS,
        _chunked_sah_trees,
    )
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = get_config("sponza").override(
        width=size, height=size, sponza_tris=tris,
    )
    scene = build_scene(cfg)
    chunks = [
        build_wide(b) for b in _chunked_sah_trees(scene.triangles, 4,
                                                  CHUNK_TRIS)
    ]
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, _ = generate_rays(
        scene.camera, size, size, jax.random.key(0), 0, False, pixel_id=pid
    )
    o = np.asarray(o)
    d = np.asarray(d)
    inv = 1.0 / d
    n = o.shape[0]
    import os
    group = int(os.environ.get("SIM_GROUP", "1024"))

    def walk_groups(child, g0, g1, best_t):
        """Walk one chunk for rays [g0,g1); returns delivered leaf tests
        (cnt summed over leaf visits where ANY ray needs) and per-ray
        best_t update (conservative: actual t ignored, t_far static)."""
        ro = o[g0:g1]
        ri = inv[g0:g1]
        c = child.reshape(-1, 8, 8)
        stack = [0]
        delivered = 0
        visits = 0
        while stack:
            node = stack.pop()
            rec = c[node]
            lo = rec[:, 0:3]
            hi = rec[:, 3:6]
            ref = rec[:, 6].astype(np.int64)
            cnt = rec[:, 7].astype(np.int64)
            # slab for all 8 children x group rays
            t0 = (lo[None, :, :] - ro[:, None, :]) * ri[:, None, :]
            t1 = (hi[None, :, :] - ro[:, None, :]) * ri[:, None, :]
            tn = np.minimum(t0, t1).max(axis=2)
            tf = np.maximum(t0, t1).min(axis=2)
            need = (tn <= np.minimum(tf, best_t[g0:g1, None])) & (tf > 0)
            any_need = need.any(axis=0)
            visits += 1
            for k in range(8):
                if not any_need[k]:
                    continue
                if cnt[k] > 0:
                    delivered += int(cnt[k])
                elif ref[k] > 0:
                    stack.append(int(ref[k]))
        return delivered, visits

    def walk_single(child, ray, best_t):
        ro = o[ray : ray + 1]
        ri = inv[ray : ray + 1]
        c = child.reshape(-1, 8, 8)
        stack = [0]
        needed = 0
        while stack:
            rec = c[stack.pop()]
            lo = rec[:, 0:3]
            hi = rec[:, 3:6]
            ref = rec[:, 6].astype(np.int64)
            cnt = rec[:, 7].astype(np.int64)
            t0 = (lo[None] - ro[:, None]) * ri[:, None]
            t1 = (hi[None] - ro[:, None]) * ri[:, None]
            tn = np.minimum(t0, t1).max(axis=2)[0]
            tf = np.maximum(t0, t1).min(axis=2)[0]
            need = (tn <= np.minimum(tf, best_t)) & (tf > 0)
            for k in range(8):
                if not need[k]:
                    continue
                if cnt[k] > 0:
                    needed += int(cnt[k])
                elif ref[k] > 0:
                    stack.append(int(ref[k]))
        return needed

    best = np.full((n,), 1e30, np.float32)
    total_delivered = 0
    total_visits = 0
    all_groups = n // group
    stride = max(1, all_groups // 64)  # ~64 groups across the WHOLE frame
    gids = list(range(0, all_groups, stride))
    for c in chunks:
        ch = np.asarray(c.child)
        for g in gids:
            dlv, vis = walk_groups(ch, g * group, (g + 1) * group, best)
            total_delivered += dlv * group  # every ray in group pays
            total_visits += vis
    rays_covered = len(gids) * group
    n_groups = len(gids)
    per_ray_delivered = total_delivered / rays_covered

    rng = np.random.default_rng(0)
    sample = rng.choice(
        np.concatenate([np.arange(g * group, (g + 1) * group) for g in gids]),
        200, replace=False,
    )
    needed = []
    for r in sample:
        tot = 0
        for c in chunks:
            tot += walk_single(np.asarray(c.child), int(r), 1e30)
        needed.append(tot)
    per_ray_needed = float(np.mean(needed))

    print(f"tris={scene.n_triangles} chunks={len(chunks)} image={size}")
    print(f"delivered leaf tests/ray (1024-ray group gating): "
          f"{per_ray_delivered:9.1f}")
    print(f"needed leaf tests/ray (single-ray walk):          "
          f"{per_ray_needed:9.1f}")
    print(f"sharing waste factor: {per_ray_delivered / per_ray_needed:6.2f}x")
    print(f"wide-node pops per group per chunk avg: "
          f"{total_visits / n_groups / len(chunks):8.1f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Driver-facing benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2,5): primary rays/s/chip, forward, on the
1M-triangle Sponza-class BVH scene. vs_baseline is measured/1e9 (the north
star's >=1e9 rays/s/chip target; the reference publishes no numbers —
BASELINE.md).

Runs on whatever accelerator jax selects (the emulated TPU v5e here).
Scene size can be overridden with BLINK_BENCH_TRIS for smoke runs.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

TARGET_RAYS_PER_S = 1e9


def main() -> int:
    n_tris = int(os.environ.get("BLINK_BENCH_TRIS", "1000000"))
    size = int(os.environ.get("BLINK_BENCH_SIZE", "1024"))

    from blink.api import build_scene
    from blink.benchmarks.harness import bench_render, roofline
    from blink.config import get_config

    # Headline config: 1M-tri scene, primary rays (forward), BVH backend.
    cfg = get_config("sponza").override(
        width=size,
        height=size,
        spp=1,
        integrator="direct",
        sponza_tris=n_tris,
    )
    scene = build_scene(cfg)
    fwd = bench_render(scene, cfg)
    result = {
        "metric": "primary_rays_per_sec_fwd_1mtri",
        "value": fwd["rays_per_s"],
        "unit": "rays/s/chip",
        "vs_baseline": fwd["rays_per_s"] / TARGET_RAYS_PER_S,
        "detail": {
            "n_triangles": scene.n_triangles,
            "image": [cfg.height, cfg.width],
            "wall_s": fwd["wall_s"],
            "roofline": roofline(scene.n_triangles, fwd["rays_per_s"]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Driver-facing benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2,5): primary rays/s/chip, forward (closest-hit
Pallas BVH traversal), on the 1M-triangle Sponza-class scene. vs_baseline
is measured/1e9 (the north star's >=1e9 rays/s/chip target; the reference
publishes no numbers — BASELINE.md).

Runs on whatever accelerator jax selects (the emulated TPU v5e here).
Overrides for smoke runs: BLINK_BENCH_TRIS, BLINK_BENCH_SIZE.
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
    from blink.benchmarks.harness import bench_primary_traversal, roofline
    from blink.config import get_config

    cfg = get_config("sponza").override(sponza_tris=n_tris)
    scene = build_scene(cfg)
    fwd = bench_primary_traversal(scene, size)
    result = {
        "metric": "primary_rays_per_sec_fwd_1mtri",
        "value": fwd["rays_per_s"],
        "unit": "rays/s/chip",
        "vs_baseline": fwd["rays_per_s"] / TARGET_RAYS_PER_S,
        "detail": {
            "n_triangles": scene.n_triangles,
            "image": [size, size],
            "wall_s": fwd["wall_s"],
            "hit_fraction": fwd["hit_fraction"],
            "n_chunks": fwd["n_chunks"],
            "roofline": roofline(scene.n_triangles, fwd["rays_per_s"]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

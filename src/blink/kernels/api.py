"""Backend: traversal implementation selector + its acceleration data
(SURVEY.md §2 "Intersection kernels"; L3 public interface).

A Backend is a pytree (so its BVH arrays flow through jit/shard_map as
arguments, never baked as constants) whose static `name` picks the
implementation:

  brute  — intersect-all-primitives (oracle; any scene, O(N*P))
  bvh    — pure-JAX stackless skip-link BVH traversal over triangles
           (spheres are always handled analytically: spec scenes have <=8)
  pallas — Pallas TPU packet-traversal kernels over the same BVH arrays

All backends return identical topology (tested in tests/test_bvh.py and
tests/tpu/test_pallas_parity.py).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from blink.core.struct import pytree_dataclass, static_field
from blink.kernels.bruteforce import intersect_brute, occluded_brute
from blink.kernels.types import Hit
from blink.scene.scene import Scene

Array = jnp.ndarray


@pytree_dataclass
class Backend:
    name: str = static_field(default="brute")
    bvh: Any = None  # FlatBVH pytree for bvh/pallas backends
    #: (T, 16) packed per-triangle shading table (scene.shade) used by
    #: diff.hitrefine — ONE wide row gather per refine instead of ~10
    #: narrow ones. None -> refine packs it from the live scene in-jit
    #: (the differentiable-geometry mode: api.fit/render_grad clear this
    #: field when triangle vertices are optimized, so the table can never
    #: go stale w.r.t. the parameters being differentiated).
    shade: Any = None

    def intersect(
        self, o: Array, d: Array, scene: Scene, alive: Array | None = None
    ) -> Hit:
        """Closest hit. `alive`: optional lane mask — dead lanes report the
        canonical miss on every backend, and on pallas also SKIP the walk
        (t_far=0 dead-lane cull; see render.integrators.li_path)."""
        if self.name == "brute":
            return intersect_brute(o, d, scene, alive=alive)
        from blink.kernels.traverse import intersect_bvh

        return intersect_bvh(
            o, d, scene, self.bvh, use_pallas=self.name == "pallas",
            alive=alive,
        )

    def occluded(self, o: Array, d: Array, scene: Scene, t_far: Array) -> Array:
        if self.name == "brute":
            return occluded_brute(o, d, scene, t_far)
        from blink.kernels.traverse import occluded_bvh

        return occluded_bvh(
            o, d, scene, self.bvh, t_far, use_pallas=self.name == "pallas"
        )


def make_backend(name: str, scene: Scene) -> Backend:
    from blink.scene.shade import pack_tri_shade_np

    if name == "auto":
        if scene.n_triangles <= 64:
            name = "brute"
        else:
            # On TPU the Pallas packet kernels are the supported (and fast)
            # traversal; the pure-JAX vmapped walk miscompiles on the axon
            # backend (docs/PARITY.md). Off-TPU the JAX walk is the
            # reference path.
            import jax

            name = "pallas" if jax.default_backend() == "tpu" else "bvh"
    if name == "brute":
        # No precomputed shade cache: brute is the oracle/differentiable
        # path (small scenes, custom losses that move vertices through
        # render_image directly) — render_image packs the table in-jit
        # from the LIVE scene, so it can never go stale. Only the
        # BVH-carrying backends (already stale-by-design under vertex
        # edits, like any acceleration structure) precompute it.
        return Backend(name="brute", bvh=None, shade=None)
    if name in ("bvh", "pallas"):
        from blink.bvh import build_flat_bvh

        shade = pack_tri_shade_np(scene.triangles)

        if name == "pallas":
            from blink.kernels.traverse_pallas import build_chunked_wide

            # VMEM-sized Morton chunks (a 1-element list for small
            # scenes), each collapsed to the 8-wide SMEM-node layout.
            # Production constants from the on-chip sweeps
            # (benchmarks/quant_sweep{,2}.py 2026-08-19;
            # chunk_merge_sweep.py + interleaved A/B 2026-08-20, 1M tris
            # @1024²): quantized u8 child boxes (12 B/child,
            # exact-conservative) double SMEM tree capacity; the
            # chunk_tris × wide_leaf balance point is ~350k/44 (3
            # passes) — closest 36.8 -> 31.3 ms (1.17x), anyhit 15.4 ->
            # 12.2 ms (1.26x) vs the round-3 250k/32, exact hit parity;
            # coarser merges (500k/48+) lose, leaf work grows faster
            # than the walk shrinks (docs/PERF_NOTES.md round-4).
            # chunk_tris is capped at 340k, NOT the measured 375k: the
            # (T/12,128) trow VMEM block hits the 16 MB scoped-VMEM
            # limit at exactly 375k tris once the pallas_call sits
            # inside render_image's spp loop (measured OOM-by-12KB,
            # 2026-08-20); 340k leaves ~1.5 MB margin and the same 3
            # balanced passes. row_tables off:
            # the group-mode kernels never read tbat/bref, and at these
            # chunk sizes the batch table would not fit VMEM anyway.
            # Chunk passes run near-to-far from the BUILD-TIME camera
            # origin: the sequential best-t threading then prunes later
            # chunks against a tight bound for primary rays (exact for
            # any camera — order only moves work between gates; the
            # build-time viewpoint is simply the best static guess).
            import numpy as np

            cam_o = np.asarray(scene.camera.origin, np.float32)
            return Backend(
                name=name,
                bvh=build_chunked_wide(
                    scene.triangles, chunk_tris=340_000, wide_leaf=44,
                    quant=True, row_tables=False, order_from=cam_o,
                ),
                shade=shade,
            )
        return Backend(
            name=name, bvh=build_flat_bvh(scene.triangles), shade=shade
        )
    raise KeyError(f"unknown backend '{name}'")

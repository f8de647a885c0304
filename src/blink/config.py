"""Config system: frozen dataclasses mirroring the five benchmark configs of
BASELINE.json:7-11, with JSON round-trip and CLI overrides (SURVEY.md §2
"Config system", §5 "Config/flag system").
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    scene: str = "cornell"  # cornell | bunny | sponza | obj:<path>
    width: int = 256
    height: int = 256
    spp: int = 1
    max_depth: int = 4
    integrator: str = "direct"  # primary | direct | path
    backend: str = "auto"  # auto | brute | bvh | pallas
    seed: int = 0
    jitter: bool = True
    # Deterministic sampling: center-pixel rays + fixed-point light samples.
    # Noise-free smooth function of scene params — the mode golden-image and
    # finite-difference tests run in (SURVEY.md §4.4-4.5).
    deterministic: bool = False
    # Scene-size knobs (procedural builders).
    bunny_subdiv: int = 6
    sponza_tris: int = 1_000_000
    # Execution knobs.
    # Soft-silhouette gradient mode for sphere geometry optimization
    # (diff.soft): 0 = off (pure fixed-topology gradients). The rendered
    # IMAGE is identical either way; only gradients change.
    soft_sigma: float = 0.0
    # Mesh (triangle) silhouette gradients via SoftRas-lite neighbor
    # candidates (diff.soft._mesh_soft_radiance); needs soft_sigma > 0.
    soft_mesh: bool = False
    compact: bool = False  # wavefront ray compaction between path bounces
    # spp-interleaved packet block (render.api.tile_pixel_ids_spp): number
    # of samples of one pixel packed consecutively inside a cull group.
    # 0 = auto (4 when spp allows). Higher values trade pixel footprint
    # for per-pixel sample clustering — at path-tracing bounces a cull
    # group then covers fewer distinct hit-point clusters, tightening the
    # packet union of the INCOHERENT bounce traversal.
    spp_block: int = 0
    # Russian-roulette path termination: 0 = off; b >= rr_start applies
    # survival p = clamp(max(throughput), 0.05, 1) with the standard
    # unbiased 1/p reweighting (render.integrators.li_path). Killed lanes
    # become zero-cost via the dead-lane cull + compaction. Ignored in
    # deterministic mode (goldens/FD need noise-free renders).
    rr_start: int = 0
    ray_chunk: int = 0  # 0 = no chunking; else rays per device pass
    donate: bool = True

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "RenderConfig":
        return RenderConfig(**json.loads(s))

    def override(self, **kwargs: Any) -> "RenderConfig":
        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        return dataclasses.replace(self, **kwargs)


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Inverse-rendering loop config (config 3, BASELINE.json:9)."""

    steps: int = 200
    lr: float = 2e-2
    optimize: tuple[str, ...] = ("sphere_center", "albedo")
    ckpt_every: int = 50
    ckpt_path: str = ""
    log_path: str = ""
    tb_dir: str = ""  # tensorboard scalars/images (optional)
    tb_image_every: int = 0  # 0 = no image summaries
    seed: int = 0


# The five benchmark configurations (BASELINE.json:7-11), by name.
PRESETS: dict[str, RenderConfig] = {
    # 1: Cornell box, 8 spheres + 2 quads, 256x256, 1 spp, Lambertian.
    "cornell": RenderConfig(
        scene="cornell", width=256, height=256, spp=1, integrator="direct"
    ),
    # 2: bunny-class ~70k tris, flat BVH, 512x512, 4 spp, direct + shadows.
    # backend=auto: Pallas kernels on TPU, pure-JAX BVH walk on CPU.
    "bunny": RenderConfig(
        scene="bunny", width=512, height=512, spp=4, integrator="direct",
        backend="auto",
    ),
    # 3: inverse rendering on the Cornell scene, 256x256.
    "fit": RenderConfig(
        scene="cornell", width=256, height=256, spp=1, integrator="direct"
    ),
    # 4: Sponza-class 1M tris, 2-level BVH, path depth 4, 16 spp, textured.
    # spp_block=16 + compact: measured +22% on chip at the literal config
    # (benchmarks/config4_probe.py, 2026-08-21: sb4 424k -> sb16+comp
    # 517k camera samples/s, identical radiance checksum) — 16-sample
    # pixel clusters tighten bounce-packet unions and the octant+cell
    # re-sort then pays where it was a wash at sb4.
    # rr_start=1 + dead-lane cull (round 5): 518 -> 725 k samples/s on
    # chip (benchmarks/cull_rr_probe.py 2026-08-21: cull +7.2% EXACT —
    # identical checksum; RR 1.31x on top, unbiased — CPU CLT test +
    # on-chip image-mean agreement 1.5e-4).
    "sponza": RenderConfig(
        scene="sponza", width=512, height=512, spp=16, integrator="path",
        max_depth=4, backend="auto", spp_block=16, compact=True,
        rr_start=1,
    ),
    # 5: multi-host pod render, 4096x4096, 64 spp, sharded rays/tiles.
    "pod": RenderConfig(
        scene="sponza", width=4096, height=4096, spp=64, integrator="path",
        max_depth=4, backend="auto", spp_block=16, compact=True,
        rr_start=1,
    ),
}


def get_config(name: str) -> RenderConfig:
    if name in PRESETS:
        return PRESETS[name]
    if name.endswith(".json"):
        with open(name) as fh:
            return RenderConfig.from_json(fh.read())
    raise KeyError(f"unknown config '{name}'; presets: {sorted(PRESETS)}")

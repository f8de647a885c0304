"""L2: acceleration structures (SURVEY.md §1)."""
from blink.bvh.build import build_boxtree, build_flat_bvh, refit_bvh
from blink.bvh.tlas import (
    TwoLevelBVH,
    build_two_level,
    instance_scene_triangles,
    traverse_two_level,
)
from blink.bvh.types import FlatBVH

__all__ = [
    "build_boxtree", "build_flat_bvh", "refit_bvh", "FlatBVH",
    "TwoLevelBVH", "build_two_level", "instance_scene_triangles",
    "traverse_two_level",
]

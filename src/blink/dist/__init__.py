"""L7: distributed execution (SURVEY.md §1)."""
from blink.dist.mesh import AXIS, init_distributed, make_mesh
from blink.dist.render import (
    dist_fit_step,
    dist_render,
    dist_render_grad,
    dryrun_step,
)
from blink.dist.scene_shard import (
    intersect_scene_sharded,
    occluded_scene_sharded,
    shard_scene_triangles,
)

__all__ = [
    "AXIS", "init_distributed", "make_mesh",
    "dist_fit_step", "dist_render", "dist_render_grad", "dryrun_step",
    "intersect_scene_sharded", "occluded_scene_sharded",
    "shard_scene_triangles",
]

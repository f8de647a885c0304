"""L2: acceleration structures (SURVEY.md §1)."""
from blink.bvh.build import build_flat_bvh, refit_bvh
from blink.bvh.types import FlatBVH

__all__ = ["build_flat_bvh", "refit_bvh", "FlatBVH"]

"""L0: math, AABB, RNG, pytree plumbing (SURVEY.md §1)."""
from blink.core.struct import pytree_dataclass, static_field
from blink.core import vec, aabb, sampler

__all__ = ["pytree_dataclass", "static_field", "vec", "aabb", "sampler"]

"""L3: intersection kernels (SURVEY.md §1)."""
from blink.kernels.api import Backend, make_backend
from blink.kernels.bruteforce import intersect_brute, occluded_brute
from blink.kernels.sphere import sphere_t
from blink.kernels.triangle import triangle_t, triangle_tuv
from blink.kernels.types import Hit, KIND_NONE, KIND_SPHERE, KIND_TRI, T_MAX, T_MIN

__all__ = [
    "Backend", "make_backend", "intersect_brute", "occluded_brute",
    "sphere_t", "triangle_t", "triangle_tuv", "Hit",
    "KIND_NONE", "KIND_SPHERE", "KIND_TRI", "T_MAX", "T_MIN",
]

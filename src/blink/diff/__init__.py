"""L4: differentiation layer (SURVEY.md §1)."""
from blink.diff.brdf import brdf_eval, brdf_pdf, sample_cosine
from blink.diff.hitrefine import HitGeom, refine
from blink.diff.scatter import scatter_grads, scatter_grads_masked

__all__ = [
    "brdf_eval", "brdf_pdf", "sample_cosine", "HitGeom", "refine",
    "scatter_grads", "scatter_grads_masked",
]

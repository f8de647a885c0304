"""L6: samplers (pixel jitter lives in render.camera; hemisphere in
diff.brdf; NEE light sampling here). SURVEY.md §1."""
from blink.sampling.lights import sample_light_point

__all__ = ["sample_light_point"]

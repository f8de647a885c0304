"""L5: rendering pipeline (SURVEY.md §1)."""
from blink.render.api import render, render_image, render_rays
from blink.render.camera import generate_rays
from blink.render.integrators import li_direct, li_path, nee_direct

__all__ = [
    "render", "render_image", "render_rays", "generate_rays",
    "li_direct", "li_path", "nee_direct",
]

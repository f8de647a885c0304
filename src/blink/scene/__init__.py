"""L1: scene representation and builders (SURVEY.md §1)."""
from blink.scene.scene import (
    Camera,
    Lights,
    Materials,
    Scene,
    Spheres,
    Triangles,
    derive_lights,
    make_scene,
    triangle_area_normal,
    triangle_vertices,
    LIGHT_SPHERE,
    LIGHT_TRI,
)
from blink.scene.builders import bunny_scene, cornell_box, sponza_scene
from blink.scene.textures import sample_texture
from blink.scene.io import load_obj, save_image_npy, save_image_ppm

__all__ = [
    "Camera", "Lights", "Materials", "Scene", "Spheres", "Triangles",
    "derive_lights", "make_scene", "triangle_area_normal", "triangle_vertices",
    "LIGHT_SPHERE", "LIGHT_TRI", "bunny_scene", "cornell_box", "sponza_scene",
    "sample_texture", "load_obj", "save_image_npy", "save_image_ppm",
]

"""On-chip dist + pallas coverage: the packet-tiled shard path
(dist.render._render_block tiling) on a 1-device mesh with the Mosaic
kernels. The CPU mesh cannot cover this — jax's pallas HLO interpreter
rejects grid-blocked kernels with shard_map-varying ray inputs (see the
NOTE in tests/test_dist.py); the Mosaic path has no such limitation, and
a 1-device mesh exercises the full shard_map program (axis_index, pcast
carries, out_specs assembly) on the real chip.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from blink.config import get_config
from blink.dist import dist_render, make_mesh
from blink.kernels.api import make_backend
from blink.render.api import render
from blink.scene.builders import bunny_scene


def test_dist_render_pallas_tiled_matches_single_chip():
    scene = bunny_scene(2)
    cfg = get_config("bunny").override(
        width=64, height=64, spp=1, deterministic=True, backend="pallas"
    )
    be = make_backend("pallas", scene)
    img1 = np.asarray(render(scene, cfg, be))
    img2 = np.asarray(dist_render(scene, cfg, be, make_mesh(1)))
    np.testing.assert_array_equal(img2, img1)

"""On-device Pallas parity (SURVEY.md §4.3): run with
`python -m pytest tests/tpu/ -q` — no backend override, executes on the
axon TPU. Excluded from the CPU CI run (tests/conftest.py collect_ignore).
Keep scenes small: each jit variant takes tens of seconds to compile here.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "src"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp
import numpy as np

from blink.bvh import build_flat_bvh
from blink.kernels.traverse import traverse_anyhit, traverse_closest
from blink.kernels.traverse_pallas import (
    pack_bvh_planes,
    traverse_anyhit_pallas,
    traverse_closest_pallas,
)
from tests.test_bvh import _random_rays, _random_tris


def test_closest_parity_tpu():
    tris = _random_tris(700, 1)
    bvh = build_flat_bvh(tris)
    planes = pack_bvh_planes(bvh)
    o, d = _random_rays(512, 21)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_pl, p_pl = traverse_closest_pallas(o, d, planes)
    np.testing.assert_allclose(
        np.asarray(t_pl), np.asarray(t_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(p_pl), np.asarray(p_ref))


def test_anyhit_parity_tpu():
    tris = _random_tris(300, 5)
    bvh = build_flat_bvh(tris)
    planes = pack_bvh_planes(bvh)
    o, d = _random_rays(512, 6)
    t_far = jnp.full((512,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_pl = traverse_anyhit_pallas(o, d, planes, t_far)
    np.testing.assert_array_equal(np.asarray(b_pl), np.asarray(b_ref))


def test_chunked_parity_tpu():
    from blink.kernels.traverse_pallas import (
        build_chunked_packed,
        traverse_closest_chunked,
    )

    tris = _random_tris(3000, 11)
    chunks = build_chunked_packed(tris, chunk_tris=1000)
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(512, 12)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_ch, p_ch = traverse_closest_chunked(o, d, chunks)
    np.testing.assert_allclose(
        np.asarray(t_ch), np.asarray(t_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(p_ch), np.asarray(p_ref))


def test_render_pipeline_tpu_matches_reference_topology():
    """Full direct-lighting render on-chip with the PALLAS backend (quad
    triangles through the chunked packet kernels + analytic spheres) vs the
    committed numpy-oracle golden (end-to-end device correctness)."""
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.api import _render_jit

    golden = np.load(
        os.path.join(
            os.path.dirname(__file__), "..", "golden", "cornell_64_det.npy"
        )
    )
    cfg = get_config("cornell").override(
        width=64, height=64, deterministic=True, backend="pallas"
    )
    scene = build_scene(cfg)
    img = np.asarray(_render_jit(scene, cfg, make_backend("pallas", scene)))
    close = np.isclose(img, golden, atol=1e-4)
    assert close.mean() > 0.999


def test_render_mesh_pallas_backend_tpu_matches_golden():
    """Bunny-class mesh (20k tris), pallas backend end-to-end on-chip
    (tile-permuted render_image -> chunked ordered traversal -> refine ->
    NEE shadow rays) vs the committed CPU bvh-backend golden."""
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.api import _render_jit

    golden = np.load(
        os.path.join(
            os.path.dirname(__file__), "..", "golden", "bunny128_sub5_det.npy"
        )
    )
    cfg = get_config("bunny").override(
        width=128, height=128, deterministic=True, backend="pallas",
        bunny_subdiv=5,
    )
    scene = build_scene(cfg)
    img = np.asarray(_render_jit(scene, cfg, make_backend("pallas", scene)))
    close = np.isclose(img, golden, atol=1e-4)
    assert close.mean() > 0.999

"""Distributed tests on 8 virtual CPU devices (SURVEY.md §4.7): sharded
render == unsharded render bit-for-bit; sharded grads == unsharded grads;
the full sharded train step runs."""
import jax
import jax.numpy as jnp
import numpy as np

from blink.api import build_scene, render_grad
from blink.config import get_config
from blink.dist import dist_render, dist_render_grad, make_mesh
from blink.kernels.api import make_backend
from blink.render.api import render


CFG = get_config("cornell").override(
    width=32, height=32, deterministic=True, backend="brute"
)
SCENE = build_scene(CFG)
BACKEND = make_backend("brute", SCENE)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_dist_render_matches_single():
    img1 = np.asarray(render(SCENE, CFG, BACKEND))
    mesh = make_mesh(8)
    img8 = np.asarray(dist_render(SCENE, CFG, BACKEND, mesh))
    np.testing.assert_array_equal(img8, img1)  # bit-identical by design
    # 2- and 4-device meshes too.
    for n in (2, 4):
        imgn = np.asarray(dist_render(SCENE, CFG, BACKEND, make_mesh(n)))
        np.testing.assert_array_equal(imgn, img1)


def test_dist_grads_match_single():
    target = render(SCENE, CFG, BACKEND)
    target = target * 0.0  # grads of plain MSE vs black
    loss1, g1 = render_grad(
        SCENE, CFG, target, ("sphere_center", "albedo"), BACKEND
    )
    mesh = make_mesh(8)
    loss8, g8 = dist_render_grad(
        SCENE, CFG, target, ("sphere_center", "albedo"), BACKEND, mesh
    )
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)  # f32 reduce order
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g8[k]), np.asarray(g1[k]), rtol=1e-4, atol=1e-6
        )


def test_dryrun_step_runs():
    from blink.dist.render import dryrun_step

    dryrun_step(8)


def test_uneven_height_raises():
    import pytest

    cfg = CFG.override(height=30)
    with pytest.raises(ValueError):
        dist_render(build_scene(cfg), cfg, BACKEND, make_mesh(8))


def test_dist_path_tracing_matches_single():
    """Config-5 shape: the path integrator (bounce loop, NEE, BVH) under
    shard_map — bit-identical to single-device."""
    cfg = get_config("pod").override(
        width=32, height=32, spp=1, max_depth=2, sponza_tris=4_000,
        deterministic=True, backend="bvh",
    )
    scene = build_scene(cfg)
    be = make_backend("bvh", scene)
    img1 = np.asarray(render(scene, cfg, be))
    img8 = np.asarray(dist_render(scene, cfg, be, make_mesh(8)))
    np.testing.assert_array_equal(img8, img1)

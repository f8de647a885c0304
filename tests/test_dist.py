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


def test_pool_env_autodetect(monkeypatch):
    """Multi-host autodetect (VERDICT r2 #6): PALLAS_AXON_POOL_IPS parses
    to (coordinator, num_processes, process_id) with explicit-id and
    local-IP-match resolution; no pool -> None; init_distributed is a
    strict no-op without a pool."""
    from blink.dist import mesh as m

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert m.pool_env() is None
    assert m.init_distributed() is False  # no pool: no-op

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1,10.0.0.2, 10.0.0.3")
    monkeypatch.setenv("PALLAS_AXON_PROCESS_ID", "2")
    env = m.pool_env()
    assert env == {
        "coordinator": f"10.0.0.1:{m.COORD_PORT}",
        "num_processes": 3,
        "process_id": 2,
    }
    monkeypatch.setenv("PALLAS_AXON_COORD_PORT", "9999")
    assert m.pool_env()["coordinator"] == "10.0.0.1:9999"

    # Local-IP matching: 127.0.0.1 is always a local address.
    monkeypatch.delenv("PALLAS_AXON_PROCESS_ID", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.9.9.9 127.0.0.1")
    env = m.pool_env()
    assert env["process_id"] == 1
    # No local match and no explicit id: loud error, not a guess.
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.9.9.8 10.9.9.9")
    import pytest

    with pytest.raises(ValueError):
        m.pool_env()
    # A single-IP "pool" is the ordinary single-process case.
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    assert m.pool_env() is None


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


def test_sharded_bvh_chunks_match_replicated():
    """VERDICT r1 #6: scene sharding over the REAL traversal — each device
    walks only its own Morton-chunk BVHs with the production Pallas packet
    kernel (interpret mode on the CPU mesh), winners combine with pmin.
    Must equal the replicated chunked traversal exactly."""
    from blink.dist.scene_shard import (
        build_sharded_chunks,
        intersect_chunks_sharded,
        occluded_chunks_sharded,
    )
    from blink.kernels.traverse_pallas import (
        build_chunked_packed,
        traverse_anyhit_chunked,
        traverse_closest_chunked,
    )
    from tests.test_bvh import _random_rays, _random_tris

    tris = _random_tris(3000, 31)
    mesh = make_mesh(8)
    stacked, meta = build_sharded_chunks(tris, 8, chunk_tris=500)
    assert meta.per_shard == 1  # 6 real chunks + 2 empty over 8 devices
    o, d = _random_rays(300, 32)

    ref_chunks = build_chunked_packed(tris, chunk_tris=500)
    t_ref, p_ref = traverse_closest_chunked(o, d, ref_chunks)
    t_sh, p_sh = intersect_chunks_sharded(o, d, stacked, meta, mesh)
    np.testing.assert_allclose(
        np.asarray(t_sh), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_sh), np.asarray(p_ref))

    t_far = jnp.full((300,), 5.0, jnp.float32)
    b_ref = traverse_anyhit_chunked(o, d, ref_chunks, t_far)
    b_sh = occluded_chunks_sharded(o, d, stacked, meta, t_far, mesh)
    np.testing.assert_array_equal(np.asarray(b_sh), np.asarray(b_ref))


def test_scene_sharding_matches_replicated():
    """SURVEY §2 'Parallelism: scene sharding': triangles sharded over the
    mesh (rays replicated), combined hits == single-device brute force."""
    from blink.dist.scene_shard import (
        intersect_scene_sharded,
        occluded_scene_sharded,
        shard_scene_triangles,
    )
    from blink.kernels.bruteforce import intersect_brute, occluded_brute
    from tests.test_bvh import _random_rays, _random_tris
    from blink.scene.scene import make_scene

    tris = _random_tris(500, 21)
    base = make_scene(triangles=tris)
    mesh = make_mesh(8)
    sharded_scene = shard_scene_triangles(base, 8)
    o, d = _random_rays(256, 22)

    # Reference on the SAME reordered scene (prim ids must correspond).
    hb = intersect_brute(o, d, sharded_scene)
    hs = intersect_scene_sharded(o, d, sharded_scene, mesh)
    np.testing.assert_allclose(
        np.asarray(hs.t), np.asarray(hb.t), rtol=1e-6, atol=1e-6
    )
    hit = np.asarray(hb.t) < 1e29
    assert (np.asarray(hs.prim)[hit] == np.asarray(hb.prim)[hit]).mean() > 0.99

    t_far = jnp.full((256,), 5.0, jnp.float32)
    bb = occluded_brute(o, d, sharded_scene, t_far)
    bs = occluded_scene_sharded(o, d, sharded_scene, t_far, mesh)
    np.testing.assert_array_equal(np.asarray(bs), np.asarray(bb))


# NOTE: dist_render with the PALLAS backend cannot be covered on the CPU
# mesh: jax's pallas HLO interpreter rejects grid-blocked kernels whose
# ray inputs carry shard_map varying-manual-axes ("dynamic_slice requires
# varying manual axes to match", jax hlo_interpreter.py:466 — framework
# limitation, reproduced even at grid=1; the error text itself suggests
# check_vma=False as a workaround, which would silence the vma machinery
# dist relies on for gradient psum). The Mosaic path does not use that
# interpreter; tests/tpu/test_dist_chip.py covers dist+pallas on-chip.

"""BVH tests (SURVEY.md §4.2): traversal == brute-force min-t (the
load-bearing invariant), bounds containment, any-hit parity, refit."""
import jax
import jax.numpy as jnp
import numpy as np

from blink.api import build_scene
from blink.bvh import build_flat_bvh, refit_bvh
from blink.config import get_config
from blink.kernels.bruteforce import intersect_brute, occluded_brute
from blink.kernels.traverse import intersect_bvh, occluded_bvh, traverse_closest
from blink.kernels.types import KIND_TRI, T_MAX
from blink.scene.builders import MeshBuilder, icosphere
from blink.scene.scene import Triangles, make_scene, derive_lights


def _random_tris(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v1 = base + 0.5 * rng.standard_normal((n, 3)).astype(np.float32)
    v2 = base + 0.5 * rng.standard_normal((n, 3)).astype(np.float32)
    verts = np.concatenate([base, v1, v2])
    idx = np.stack(
        [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], axis=-1
    ).astype(np.int32)
    return Triangles(
        verts=jnp.asarray(verts),
        idx=jnp.asarray(idx),
        uv=jnp.zeros((3 * n, 2), jnp.float32),
        material_id=jnp.zeros((n,), jnp.int32),
    )


def _random_rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_traversal_equals_bruteforce_random():
    for seed, ntri in [(0, 37), (1, 200), (2, 1000)]:
        tris = _random_tris(ntri, seed)
        scene = make_scene(triangles=tris)
        bvh = build_flat_bvh(tris)
        o, d = _random_rays(512, seed + 10)
        hb = intersect_brute(o, d, scene)
        hv = intersect_bvh(o, d, scene, bvh)
        np.testing.assert_allclose(
            np.asarray(hv.t), np.asarray(hb.t), rtol=1e-5, atol=1e-4
        )
        # Same primitive wherever there is an unambiguous hit.
        hit = np.asarray(hb.t) < T_MAX * 0.99
        assert (np.asarray(hv.kind)[hit] == np.asarray(hb.kind)[hit]).all()
        same = np.asarray(hv.prim)[hit] == np.asarray(hb.prim)[hit]
        assert same.mean() > 0.99  # ties on coplanar overlaps may differ


def test_anyhit_equals_bruteforce():
    tris = _random_tris(300, 5)
    scene = make_scene(triangles=tris)
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(512, 6)
    t_far = jnp.full((512,), 5.0, jnp.float32)
    bb = occluded_brute(o, d, scene, t_far)
    bv = occluded_bvh(o, d, scene, bvh, t_far)
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(bb))


def test_bvh_bounds_contain_triangles():
    tris = _random_tris(123, 3)
    bvh = build_flat_bvh(tris)
    lo = np.asarray(bvh.lo)
    hi = np.asarray(bvh.hi)
    count = np.asarray(bvh.count)
    first = np.asarray(bvh.first)
    tv0 = np.asarray(bvh.tv0)
    te1 = np.asarray(bvh.te1)
    te2 = np.asarray(bvh.te2)
    for n in np.nonzero(count > 0)[0]:
        for j in range(count[n]):
            for p in (
                tv0[first[n] + j],
                tv0[first[n] + j] + te1[first[n] + j],
                tv0[first[n] + j] + te2[first[n] + j],
            ):
                assert (p >= lo[n] - 1e-4).all() and (p <= hi[n] + 1e-4).all()
    # Root bounds contain everything.
    assert (lo[0] <= lo[count > 0].min(axis=0) + 1e-4).all()


def test_bvh_skip_structure():
    tris = _random_tris(50, 7)
    bvh = build_flat_bvh(tris)
    skip = np.asarray(bvh.skip)
    count = np.asarray(bvh.count)
    n = skip.shape[0]
    assert skip[0] == n  # root subtree is the whole tree
    # Leaves skip to the next node.
    leaves = np.nonzero(count > 0)[0]
    np.testing.assert_array_equal(skip[leaves], leaves + 1)
    # Skips are strictly increasing targets within bounds.
    assert (skip > np.arange(n)).all() and (skip <= n).all()


def test_bvh_scene_render_matches_brute():
    cfg = get_config("bunny").override(
        width=48, height=48, spp=1, deterministic=True, bunny_subdiv=2
    )
    scene = build_scene(cfg)
    from blink.kernels.api import make_backend
    from blink.render.api import render_image

    img_b = np.asarray(render_image(scene, cfg, make_backend("brute", scene)))
    img_v = np.asarray(render_image(scene, cfg, make_backend("bvh", scene)))
    np.testing.assert_allclose(img_v, img_b, atol=1e-4)


def test_refit_tracks_moved_vertices():
    tris = _random_tris(64, 9)
    bvh = build_flat_bvh(tris)
    # Move all vertices and refit; compare against a fresh build on the
    # moved geometry: same topology (Morton order unchanged by a global
    # translation), so bounds and SoA must match exactly.
    moved = tris.replace(
        verts=tris.verts + jnp.asarray([10.0, -3.0, 0.5], tris.verts.dtype)
    )
    refit = jax.jit(lambda b, t: refit_bvh(b, t))(bvh, moved)
    rebuilt = build_flat_bvh(moved)
    np.testing.assert_allclose(np.asarray(refit.lo), np.asarray(rebuilt.lo), atol=1e-4)
    np.testing.assert_allclose(np.asarray(refit.hi), np.asarray(rebuilt.hi), atol=1e-4)
    np.testing.assert_allclose(np.asarray(refit.tv0), np.asarray(rebuilt.tv0), atol=1e-5)
    # Traversal on the refit BVH agrees with brute force on moved scene.
    scene = make_scene(triangles=moved)
    o, d = _random_rays(256, 11)
    o = o + jnp.asarray([10.0, -3.0, 0.5], o.dtype)
    hb = intersect_brute(o, d, scene)
    hv = intersect_bvh(o, d, scene, refit)
    np.testing.assert_allclose(np.asarray(hv.t), np.asarray(hb.t), rtol=1e-5, atol=1e-4)


def test_empty_and_tiny_meshes():
    from blink.scene.scene import empty_triangles

    bvh = build_flat_bvh(empty_triangles())
    o, d = _random_rays(16, 12)
    t, prim = traverse_closest(o, d, bvh)
    assert (np.asarray(prim) == -1).all()
    # One triangle.
    tris = _random_tris(1, 13)
    bvh1 = build_flat_bvh(tris)
    scene = make_scene(triangles=tris)
    hb = intersect_brute(o, d, scene)
    hv = intersect_bvh(o, d, scene, bvh1)
    np.testing.assert_allclose(np.asarray(hv.t), np.asarray(hb.t), atol=1e-4)

"""Unit tests: ray-sphere / ray-triangle kernels vs closed-form cases and
property tests (SURVEY.md §4.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from blink.kernels.sphere import sphere_t
from blink.kernels.triangle import triangle_t, triangle_tuv
from blink.kernels.types import T_MAX


def test_sphere_axis_hit():
    t = sphere_t(
        jnp.array([0.0, 0.0, -5.0]),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([0.0, 0.0, 0.0]),
        jnp.asarray(1.0),
        1e-3,
    )
    np.testing.assert_allclose(float(t), 4.0, atol=1e-5)


def test_sphere_miss_and_graze():
    miss = sphere_t(
        jnp.array([0.0, 2.0, -5.0]),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.zeros(3),
        jnp.asarray(1.0),
        1e-3,
    )
    assert float(miss) >= 0.99 * T_MAX
    # Tangent ray (discriminant == 0) counts as a miss (disc > 0 strict).
    graze = sphere_t(
        jnp.array([0.0, 1.0, -5.0]),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.zeros(3),
        jnp.asarray(1.0),
        1e-3,
    )
    assert float(graze) >= 0.99 * T_MAX


def test_sphere_inside_origin_far_root():
    t = sphere_t(
        jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.asarray(1.0), 1e-3
    )
    np.testing.assert_allclose(float(t), 1.0, atol=1e-5)


def test_sphere_unnormalized_direction():
    t = sphere_t(
        jnp.array([0.0, 0.0, -5.0]),
        jnp.array([0.0, 0.0, 2.0]),
        jnp.zeros(3),
        jnp.asarray(1.0),
        1e-3,
    )
    np.testing.assert_allclose(float(t), 2.0, atol=1e-5)


def _tri():
    v0 = jnp.array([-1.0, -1.0, 0.0])
    v1 = jnp.array([1.0, -1.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    return v0, v1 - v0, v2 - v0


def test_triangle_center_hit_both_sides():
    v0, e1, e2 = _tri()
    t = triangle_t(
        jnp.array([0.0, -0.2, -3.0]), jnp.array([0.0, 0.0, 1.0]), v0, e1, e2, 1e-3
    )
    np.testing.assert_allclose(float(t), 3.0, atol=1e-5)
    t2 = triangle_t(
        jnp.array([0.0, -0.2, 3.0]), jnp.array([0.0, 0.0, -1.0]), v0, e1, e2, 1e-3
    )
    np.testing.assert_allclose(float(t2), 3.0, atol=1e-5)


def test_triangle_outside_misses():
    v0, e1, e2 = _tri()
    for o in ([2.0, 0.0, -3.0], [0.0, 2.0, -3.0], [-2.0, -2.0, -3.0]):
        t = triangle_t(jnp.array(o), jnp.array([0.0, 0.0, 1.0]), v0, e1, e2, 1e-3)
        assert float(t) >= 0.99 * T_MAX


def test_triangle_parallel_ray_misses():
    v0, e1, e2 = _tri()
    t = triangle_t(
        jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]), v0, e1, e2, 1e-3
    )
    assert float(t) >= 0.99 * T_MAX


def test_triangle_barycentrics_on_plane():
    """Property: random hits satisfy o + t d = v0 + u e1 + v e2 to 1e-5."""
    rng = np.random.default_rng(3)
    v0 = jnp.asarray(rng.standard_normal(3), jnp.float32)
    e1 = jnp.asarray(rng.standard_normal(3), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal(3), jnp.float32)
    # Aim rays at random interior points from random origins.
    n = 256
    r1 = rng.uniform(0.05, 0.9, n).astype(np.float32)
    r2 = (rng.uniform(0.05, 0.9, n) * (1.0 - r1)).astype(np.float32)
    target = (
        np.asarray(v0)[None]
        + r1[:, None] * np.asarray(e1)[None]
        + r2[:, None] * np.asarray(e2)[None]
    )
    # Origins displaced off-plane along the normal (±[1,3]) with small
    # tangential jitter so no ray is near-grazing (grazing hits lose f32
    # precision by construction; they are excluded from this property).
    nrm = np.cross(np.asarray(e1), np.asarray(e2))
    nrm /= np.linalg.norm(nrm)
    h = rng.uniform(1.0, 3.0, n) * rng.choice([-1.0, 1.0], n)
    o = jnp.asarray(
        target + h[:, None] * nrm[None] + 0.3 * rng.standard_normal((n, 3)),
        jnp.float32,
    )
    d = jnp.asarray(target, jnp.float32) - o
    t, u, v = jax.vmap(lambda oo, dd: triangle_tuv(oo, dd, v0, e1, e2, 1e-3))(o, d)
    hit = np.asarray(t) < T_MAX
    assert hit.mean() > 0.95  # a few may fall behind t_min
    p_ray = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    p_bar = (
        np.asarray(v0)[None]
        + np.asarray(u)[:, None] * np.asarray(e1)[None]
        + np.asarray(v)[:, None] * np.asarray(e2)[None]
    )
    np.testing.assert_allclose(p_ray[hit], p_bar[hit], atol=1e-3)
    np.testing.assert_allclose(np.asarray(u)[hit], r1[hit], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v)[hit], r2[hit], atol=1e-3)


def test_sphere_hit_point_on_surface():
    """Property: hit points lie on the sphere to 1e-5."""
    rng = np.random.default_rng(4)
    n = 256
    c = jnp.asarray(rng.standard_normal(3), jnp.float32)
    r = jnp.asarray(1.3, jnp.float32)
    o = jnp.asarray(c + rng.standard_normal((n, 3)) * 4.0, jnp.float32)
    d = jnp.asarray(
        np.asarray(c)[None] + 0.5 * rng.standard_normal((n, 3)) - np.asarray(o),
        jnp.float32,
    )
    t = jax.vmap(lambda oo, dd: sphere_t(oo, dd, c, r, 1e-3))(o, d)
    hit = np.asarray(t) < T_MAX
    assert hit.mean() > 0.5
    p = np.asarray(o) + np.asarray(t)[:, None] * np.asarray(d)
    dist = np.linalg.norm(p[hit] - np.asarray(c)[None], axis=-1)
    np.testing.assert_allclose(dist, 1.3, atol=1e-3)


def test_sphere_pass_pallas_matches_vmapped():
    """SURVEY §2 'Ray-sphere kernel: Pallas + JAX': the packet Pallas
    sphere pass (interpret mode on CPU, Mosaic on TPU) must agree with
    the vmapped jnp pass under the caller's strict `< t_max` combine —
    same winners, same t on every strict winner."""
    import jax
    import numpy as np

    from blink.kernels.sphere import sphere_pass_pallas, sphere_t

    rng = np.random.default_rng(7)
    S, N = 8, 700
    center = jnp.asarray(rng.uniform(-3, 3, (S, 3)), jnp.float32)
    radius = jnp.asarray(rng.uniform(0.2, 1.5, (S,)), jnp.float32)
    o = jnp.asarray(rng.uniform(-6, 6, (N, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.asarray(rng.uniform(0.5, 20.0, (N,)), jnp.float32)

    ts = jax.vmap(
        lambda oo, dd, tm: sphere_t(oo, dd, center, radius, 1e-3, tm)
    )(o, d, t_max)
    t_ref = jnp.min(ts, axis=-1)
    p_ref = jnp.argmin(ts, axis=-1).astype(jnp.int32)

    t_pl, p_pl = sphere_pass_pallas(o, d, center, radius, t_max, t_min=1e-3)

    # The combine both callers apply: a sphere wins iff t < t_max strictly.
    win_ref = np.asarray(t_ref < t_max)
    win_pl = np.asarray(t_pl < t_max)
    np.testing.assert_array_equal(win_pl, win_ref)
    assert win_ref.any()  # non-vacuous: some rays do hit
    np.testing.assert_array_equal(
        np.asarray(p_pl)[win_ref], np.asarray(p_ref)[win_ref]
    )
    # identical math, but interpret-mode fusion may differ by an ulp
    np.testing.assert_allclose(
        np.asarray(t_pl)[win_ref], np.asarray(t_ref)[win_ref], rtol=1e-5
    )


def test_bvh_backend_sphere_combine_pallas_matches_bvh():
    """intersect/occluded with spheres + triangle BVH: the pallas backend
    (Pallas sphere pass + packet traversal, interpret on CPU) must return
    the same topology as the pure-JAX bvh backend."""
    import numpy as np

    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.api import make_backend
    from blink.render.camera import generate_rays
    from blink.scene.scene import Spheres

    cfg = get_config("bunny").override(
        width=32, height=32, bunny_subdiv=2, backend="bvh"
    )
    scene = build_scene(cfg)
    rng = np.random.default_rng(3)
    v = np.asarray(scene.triangles.verts)
    lo, hi = v.min(0), v.max(0)
    c = rng.uniform(lo, hi, (4, 3)).astype(np.float32)
    r = np.full((4,), 0.25 * float((hi - lo).max()), np.float32)
    scene = scene.replace(
        spheres=Spheres(
            center=jnp.asarray(c), radius=jnp.asarray(r),
            material_id=jnp.zeros((4,), jnp.int32),
        )
    )
    import jax

    o, d, _ = generate_rays(scene.camera, 32, 32, jax.random.key(0), 0, False)
    hit_bvh = make_backend("bvh", scene).intersect(o, d, scene)
    hit_pl = make_backend("pallas", scene).intersect(o, d, scene)
    np.testing.assert_array_equal(np.asarray(hit_pl.kind), np.asarray(hit_bvh.kind))
    np.testing.assert_array_equal(np.asarray(hit_pl.prim), np.asarray(hit_bvh.prim))
    np.testing.assert_allclose(
        np.asarray(hit_pl.t), np.asarray(hit_bvh.t), rtol=1e-5
    )

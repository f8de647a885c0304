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

"""Unit tests: L0 math, AABB slab test, counter-based sampler."""
import jax
import jax.numpy as jnp
import numpy as np

from blink.core import aabb, sampler, vec


def test_normalize_unit():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((128, 3)), jnp.float32)
    n = vec.normalize(v)
    np.testing.assert_allclose(np.asarray(vec.length(n)), 1.0, atol=1e-5)


def test_normalize_zero_safe():
    n = vec.normalize(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(n)))


def test_onb_orthonormal():
    rng = np.random.default_rng(1)
    n = vec.normalize(jnp.asarray(rng.standard_normal((256, 3)), jnp.float32))
    t, b, nn = vec.make_onb(n)
    for a, c in [(t, b), (t, nn), (b, nn)]:
        np.testing.assert_allclose(np.asarray(vec.vdot(a, c)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.length(t)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.length(b)), 1.0, atol=1e-5)
    # Right-handed: t x b = n
    np.testing.assert_allclose(
        np.asarray(vec.cross(t, b)), np.asarray(nn), atol=1e-5
    )


def test_local_roundtrip():
    rng = np.random.default_rng(2)
    n = vec.normalize(jnp.asarray(rng.standard_normal((64, 3)), jnp.float32))
    v = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    t, b, nn = vec.make_onb(n)
    loc = vec.to_local(v, t, b, nn)
    back = vec.from_local(loc, t, b, nn)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_ray_aabb_hit_miss():
    o = jnp.array([0.0, 0.0, -5.0])
    inv_d = 1.0 / jnp.array([0.0, 0.0, 1.0])  # +z ray, inf inverses in x/y
    lo = jnp.array([-1.0, -1.0, -1.0])
    hi = jnp.array([1.0, 1.0, 1.0])
    assert bool(aabb.ray_aabb(o, inv_d, 0.0, 1e30, lo, hi))
    # Behind the ray.
    assert not bool(aabb.ray_aabb(o, inv_d, 0.0, 3.0, lo, hi))
    # Offset to the side.
    o2 = jnp.array([5.0, 0.0, -5.0])
    assert not bool(aabb.ray_aabb(o2, inv_d, 0.0, 1e30, lo, hi))
    # Origin on a slab boundary of a parallel ray (0 * inf NaN guard).
    o3 = jnp.array([1.0, 0.0, -5.0])
    assert bool(aabb.ray_aabb(o3, inv_d, 0.0, 1e30, lo, hi))


def test_ray_aabb_negative_direction():
    o = jnp.array([0.0, 0.0, 5.0])
    inv_d = 1.0 / jnp.array([0.0, 0.0, -1.0])
    lo = jnp.array([-1.0, -1.0, -1.0])
    hi = jnp.array([1.0, 1.0, 1.0])
    assert bool(aabb.ray_aabb(o, inv_d, 0.0, 1e30, lo, hi))


def test_sampler_deterministic_and_order_independent():
    key = jax.random.key(7)
    ks = jax.vmap(lambda p: sampler.pixel_key(key, p, 3))(
        jnp.arange(64, dtype=jnp.uint32)
    )
    u_all = jax.vmap(lambda k: sampler.uniform(k, (2,), dim=1))(ks)
    # Single-pixel evaluation matches the batched one (order independence).
    k17 = sampler.pixel_key(key, jnp.uint32(17), 3)
    u17 = sampler.uniform(k17, (2,), dim=1)
    np.testing.assert_array_equal(np.asarray(u_all[17]), np.asarray(u17))
    # Different dims/bounces decorrelate.
    a = sampler.uniform(k17, (), dim=0)
    b = sampler.uniform(k17, (), dim=1)
    assert float(a) != float(b)

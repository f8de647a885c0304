"""3-vector math over trailing-axis-3 arrays.

All functions operate on arrays of shape (..., 3) and broadcast like jnp.
These are the leaf primitives of the framework (SURVEY.md §1 L0); they are
pure jnp so the same code runs on TPU, in Pallas kernel bodies, and on the
CPU backend used by the finite-difference oracle.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

#: Geometry epsilon used for self-intersection offsets and degenerate guards.
EPS = 1e-6
#: Sentinel "no hit" distance.
INF = jnp.inf


def vdot(a: Array, b: Array) -> Array:
    """Dot product over the trailing axis, keepdims dropped: (...,3)->(...)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def length(a: Array) -> Array:
    return jnp.sqrt(vdot(a, a))


def normalize(a: Array, eps: float = EPS) -> Array:
    """Safe normalize: returns a / max(|a|, eps)."""
    return a / jnp.maximum(length(a), eps)[..., None]


def reflect(d: Array, n: Array) -> Array:
    """Reflect direction d about normal n (both (...,3))."""
    return d - 2.0 * vdot(d, n)[..., None] * n


def make_onb(n: Array) -> tuple[Array, Array, Array]:
    """Build an orthonormal basis (t, b, n) from unit normal n.

    Branchless Frisvad-style construction (via jnp.where), stable for
    n.z -> -1, so it is safe inside jit/vmap and differentiable a.e.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t0 = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t1 = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t0, t1, n


def to_local(v: Array, t: Array, b: Array, n: Array) -> Array:
    """Express world vector v in the (t, b, n) frame."""
    return jnp.stack([vdot(v, t), vdot(v, b), vdot(v, n)], axis=-1)


def from_local(v: Array, t: Array, b: Array, n: Array) -> Array:
    """Express local-frame vector v in world coordinates."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def luminance(rgb: Array) -> Array:
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]

"""Ray-sphere intersection (SURVEY.md §2 "Ray-sphere kernel: Pallas + JAX";
BASELINE.json:5).

Two forms of the same branchless analytic quadratic:
  - sphere_t: pure jnp, so the identical arithmetic runs inside Pallas
    kernel bodies, in the vmapped fallback, and on CPU (incl. f64 FD runs);
  - sphere_pass_pallas: a packet Pallas kernel over the packed-ray layout
    (sphere table in SMEM, unrolled over the <=8 spec spheres) used by the
    pallas backend's sphere pass on TPU. Measured context
    (benchmarks/sphere_cost_probe.py, 1M tris @1024², 2026-08-20): the
    vmapped pass costs ~1 ms against a ~31 ms traversal — this kernel
    exists for kernel-layer completeness (every hit test Pallas-native),
    not as a bottleneck fix.

Returns t = T_MAX on miss.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from blink.kernels.types import T_MAX

Array = jnp.ndarray


def sphere_t(o: Array, d: Array, center: Array, radius: Array,
             t_min: float | Array, t_max: float | Array = T_MAX) -> Array:
    """Smallest t in [t_min, t_max] where ray o+t*d hits the sphere.

    Broadcasts: o,d (...,3); center (...,3); radius (...). d need not be
    normalized. Branchless: misses return T_MAX.
    """
    oc = o - center
    a = jnp.sum(d * d, axis=-1)
    half_b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = half_b * half_b - a * c
    hit_disc = disc > 0.0
    # Double-where: sqrt must never see <=0 even in the untaken branch, or
    # its inf derivative turns the masked-out gradient into NaN (0 * inf).
    sq = jnp.sqrt(jnp.where(hit_disc, disc, 1.0))
    inv_a = 1.0 / a
    t0 = (-half_b - sq) * inv_a  # near root
    t1 = (-half_b + sq) * inv_a  # far root (ray origin inside sphere)
    t = jnp.where(t0 >= t_min, t0, t1)
    valid = hit_disc & (t >= t_min) & (t <= t_max)
    return jnp.where(valid, t, T_MAX)


#: unroll bound for the SMEM sphere table (spec scenes have <= 8 spheres;
#: the vmapped path has no bound and serves larger counts).
MAX_PALLAS_SPHERES = 64


def _make_sphere_kernel(n_spheres: int, t_min: float, rows: int):
    def kernel(tab_ref, o_ref, d_ref, tmax_ref, t_out_ref, prim_out_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a
        best = jnp.minimum(tmax_ref[...], T_MAX)
        cap = best  # per-ray t_max cap (the caller's running best t)
        prim = jnp.full(best.shape, -1, jnp.int32)
        for s in range(n_spheres):
            cx = tab_ref[4 * s]
            cy = tab_ref[4 * s + 1]
            cz = tab_ref[4 * s + 2]
            r = tab_ref[4 * s + 3]
            ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
            half_b = ocx * dx + ocy * dy + ocz * dz
            c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = half_b * half_b - a * c
            hit_disc = disc > 0.0
            sq = jnp.sqrt(jnp.where(hit_disc, disc, 1.0))
            t0 = (-half_b - sq) * inv_a
            t1 = (-half_b + sq) * inv_a
            t = jnp.where(t0 >= t_min, t0, t1)
            # Ascending s + strict < == jnp.argmin's first-min-wins.
            better = hit_disc & (t >= t_min) & (t <= cap) & (t < best)
            best = jnp.where(better, t, best)
            prim = jnp.where(better, jnp.int32(s), prim)
        t_out_ref[...] = jnp.where(prim >= 0, best, T_MAX)
        prim_out_ref[...] = jnp.maximum(prim, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def sphere_pass_pallas(
    o: Array, d: Array, center: Array, radius: Array, t_max: Array,
    t_min: float = 1e-3, interpret: bool | None = None,
):
    """Packet Pallas sphere pass: closest sphere hit per ray under the
    per-ray cap t_max. Returns (t (N,) — T_MAX on miss/over-cap,
    prim (N,) — argmin index, 0 on miss) with semantics identical to
    kernels.traverse._sphere_pass (strict first-min-wins ties)."""
    from blink.kernels.traverse_pallas import (
        LANES, RAY_ROWS, _pack_rays, _resolve_interpret, _vma_of,
    )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _resolve_interpret(interpret)
    o, d, t_max = jax.lax.stop_gradient((o, d, t_max))
    n = o.shape[0]
    s = center.shape[0]
    if s > MAX_PALLAS_SPHERES:
        raise ValueError(
            f"sphere_pass_pallas unrolls over spheres; {s} > "
            f"{MAX_PALLAS_SPHERES} — use the vmapped sphere_t pass"
        )
    tab = jnp.concatenate(
        [jnp.asarray(center, jnp.float32),
         jnp.asarray(radius, jnp.float32)[:, None]], axis=1
    ).reshape(-1)  # (S*4,) SMEM table
    o_t, d_t, tm_t, g = _pack_rays(o, d, t_max)
    kernel = _make_sphere_kernel(s, float(t_min), RAY_ROWS)
    ray3 = pl.BlockSpec(
        (3, RAY_ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ray1 = pl.BlockSpec(
        (RAY_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    tabspec = pl.BlockSpec(tab.shape, lambda i: (0,), memory_space=pltpu.SMEM)
    vma = _vma_of(o_t, d_t, tm_t, tab)
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[tabspec, ray3, ray3, ray1],
        out_specs=(ray1, ray1),
        out_shape=(
            jax.ShapeDtypeStruct((g * RAY_ROWS, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((g * RAY_ROWS, LANES), jnp.int32, vma=vma),
        ),
        interpret=interpret,
    )(tab, o_t, d_t, tm_t)
    return t_out.reshape(-1)[:n], prim_out.reshape(-1)[:n]

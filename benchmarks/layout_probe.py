"""On-chip probe: is the shading path slow because of (N,3) layouts?

TPU vregs are 8x128; an (N,3) f32 array tiles as N sublanes x 3 lanes of
128 -> ~2% lane utilization for every elementwise op, and gathers of
(V,3) rows move whole padded tiles. This times the same logical ops in
(N,3) form vs planar ((N,) per component) form, plus the gather/scatter
patterns the render path uses. Run: python benchmarks/layout_probe.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

N = 1 << 18  # rays
V = 1_000_000  # table rows


def t(f, *a, reps=5):
    f = jax.jit(f)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    key = jax.random.key(0)
    a3 = jax.random.normal(key, (N, 3), jnp.float32)
    b3 = jax.random.normal(jax.random.key(1), (N, 3), jnp.float32)
    ap = tuple(a3[:, i] for i in range(3))
    bp = tuple(b3[:, i] for i in range(3))
    tab3 = jax.random.normal(jax.random.key(2), (V, 3), jnp.float32)
    tabp = tuple(tab3[:, i] for i in range(3))
    idx = jax.random.randint(jax.random.key(3), (N,), 0, V, jnp.int32)
    perm = jax.random.permutation(jax.random.key(4), N)

    # 1. elementwise chain: normalize(a) x b dot, ~20 flops/elem
    def ew3(a, b):
        n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        c = jnp.cross(n, b)
        return jnp.sum(c * b, axis=-1)

    def ewp(ax, ay, az, bx, by, bz):
        inv = jax.lax.rsqrt(ax * ax + ay * ay + az * az)
        nx, ny, nz = ax * inv, ay * inv, az * inv
        cx = ny * bz - nz * by
        cy = nz * bx - nx * bz
        cz = nx * by - ny * bx
        return cx * bx + cy * by + cz * bz

    print(f"elementwise (N,3):   {t(ew3, a3, b3)*1e3:8.2f} ms")
    print(f"elementwise planar:  {t(ewp, *ap, *bp)*1e3:8.2f} ms")

    # 2. gather N rows from (V,3) vs 3 planar gathers
    print(f"gather (V,3)[idx]:   {t(lambda i: tab3[i], idx)*1e3:8.2f} ms")
    print(
        f"gather 3x (V,)[idx]: "
        f"{t(lambda i: tuple(c[i] for c in tabp), idx)*1e3:8.2f} ms"
    )

    # 3. inverse-perm scatter (render_image's .at[perm].set)
    def scat3(x, p):
        return jnp.zeros_like(x).at[p].set(x)

    print(f"scatter (N,3)[perm]: {t(scat3, a3, perm)*1e3:8.2f} ms")
    print(
        f"gather-inverse perm: "
        f"{t(lambda x, p: x[jnp.argsort(p)], a3, perm)*1e3:8.2f} ms"
    )
    iperm = jnp.argsort(perm)
    print(f"gather by iperm:     {t(lambda x: x[iperm], a3)*1e3:8.2f} ms")
    pp = tuple(a3[:, i] for i in range(3))
    print(
        f"planar gather iperm: "
        f"{t(lambda xs: tuple(c[iperm] for c in xs), pp)*1e3:8.2f} ms"
    )

    # 4. (N,) gather from small table (materials: 16 rows)
    small = jax.random.normal(jax.random.key(5), (16, 3), jnp.float32)
    mid = jax.random.randint(jax.random.key(6), (N,), 0, 16, jnp.int32)
    print(f"gather (16,3)[mid]:  {t(lambda i: small[i], mid)*1e3:8.2f} ms")
    oneh = lambda i: jax.nn.one_hot(i, 16, dtype=jnp.float32) @ small
    print(f"one-hot matmul 16:   {t(oneh, mid)*1e3:8.2f} ms")


if __name__ == "__main__":
    sys.path.insert(0, "src")
    main()

"""Follow-up probe: gather cost scaling + alternatives.

layout_probe found ~9 ms per 262k-row gather regardless of table size
(per-element overhead, not bandwidth). Decide between: (a) one packed
wide-row gather for all shading attributes, (b) select-sweep for small
tables, (c) in-kernel attribute emission. Run: python benchmarks/gather_probe.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def t(f, *a, reps=5):
    f = jax.jit(f)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    V = 1_000_000
    tab1 = jax.random.normal(jax.random.key(0), (V,), jnp.float32)
    tab32 = jax.random.normal(jax.random.key(1), (V, 32), jnp.float32)
    tab128 = jax.random.normal(jax.random.key(2), (V, 128), jnp.float32)

    for N in (1 << 16, 1 << 18, 1 << 20):
        idx = jax.random.randint(jax.random.key(3), (N,), 0, V, jnp.int32)
        a = t(lambda i: tab1[i], idx)
        b = t(lambda i: tab32[i], idx)
        c = t(lambda i: tab128[i], idx)
        print(
            f"N={N:>8}: (V,)[i] {a*1e3:7.2f}ms  (V,32)[i] {b*1e3:7.2f}ms "
            f" (V,128)[i] {c*1e3:7.2f}ms  ns/row {a/N*1e9:5.1f}"
        )

    # sorted indices (spatially-coherent rays hit coherent prims)
    N = 1 << 18
    idx = jnp.sort(jax.random.randint(jax.random.key(3), (N,), 0, V, jnp.int32))
    print(f"sorted idx (V,32):  {t(lambda i: tab32[i], idx)*1e3:7.2f}ms")
    print(
        f"sorted+hint (V,32): "
        f"{t(lambda i: tab32.at[i].get(indices_are_sorted=True), idx)*1e3:7.2f}ms"
    )

    # select-sweep vs gather for small tables, (N,3) out
    small = jax.random.normal(jax.random.key(5), (16, 3), jnp.float32)
    mid = jax.random.randint(jax.random.key(6), (N,), 0, 16, jnp.int32)

    def sweep(i):
        out = jnp.zeros((N, 3), jnp.float32)
        for k in range(16):
            out = jnp.where((i == k)[:, None], small[k], out)
        return out

    print(f"sweep16 (N,3):      {t(sweep, mid)*1e3:7.2f}ms")

    def sweep_planar(i):
        ox = jnp.zeros((N,), jnp.float32)
        oy = jnp.zeros((N,), jnp.float32)
        oz = jnp.zeros((N,), jnp.float32)
        for k in range(16):
            m = i == k
            ox = jnp.where(m, small[k, 0], ox)
            oy = jnp.where(m, small[k, 1], oy)
            oz = jnp.where(m, small[k, 2], oz)
        return ox, oy, oz

    print(f"sweep16 planar:     {t(sweep_planar, mid)*1e3:7.2f}ms")

    # one-hot bf16 einsum on the MXU (medium tables)
    med = jax.random.normal(jax.random.key(7), (256, 3), jnp.float32)
    mid256 = jax.random.randint(jax.random.key(8), (N,), 0, 256, jnp.int32)

    def onehot_mm(i):
        oh = (i[:, None] == jnp.arange(256)[None, :]).astype(jnp.bfloat16)
        return (oh @ med.astype(jnp.bfloat16)).astype(jnp.float32)

    print(f"onehot256 bf16 mm:  {t(onehot_mm, mid256)*1e3:7.2f}ms")
    print(f"gather (256,3)[i]:  {t(lambda i: med[i], mid256)*1e3:7.2f}ms")

    # arithmetic tile (de)interleave vs gather-by-perm (render_image path)
    H = W = 512
    x = jax.random.normal(jax.random.key(9), (H * W, 3), jnp.float32)

    def tile_arith(x):
        v = x.reshape(H // 64, 64, W // 64, 64, 3)
        return v.transpose(0, 2, 1, 3, 4).reshape(H * W, 3)

    print(f"tile via transpose: {t(tile_arith, x)*1e3:7.2f}ms")


if __name__ == "__main__":
    sys.path.insert(0, "src")
    main()

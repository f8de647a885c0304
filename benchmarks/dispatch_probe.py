"""Decisive probe: is gather cost per-ELEMENT or per-OP on this chip?

Times ONE jit program containing K data-dependent (unfusable) gathers,
for K in {1,4,16} x N in {65k, 262k, 1M}. If wall time scales with K but
not N -> fixed per-op overhead (fix = fewer ops). If it scales with K*N
-> per-element gather cost (fix = fewer gathered elements, wide rows).
Also times K chained elementwise ops (fusable baseline) and a wide-row
gather to test the "width is free" hypothesis.

Run: PYTHONPATH=src python benchmarks/dispatch_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

V = 1 << 20


def t(f, *a, reps=10):
    f = jax.jit(f)
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    tab = jax.random.normal(jax.random.key(0), (V,), jnp.float32)
    tab8 = jax.random.normal(jax.random.key(1), (V, 8), jnp.float32)
    tab32 = jax.random.normal(jax.random.key(2), (V, 32), jnp.float32)

    print("=== chained gathers: one jit program, K dependent gathers ===")
    for N in (1 << 16, 1 << 18, 1 << 20):
        idx0 = jax.random.randint(jax.random.key(3), (N,), 0, V, jnp.int32)

        def chain(idx, K):
            # each gather feeds the next index -> cannot fuse or elide
            for _ in range(K):
                idx = (tab[idx].astype(jnp.int32) + idx + 1) % V
            return idx

        for K in (1, 4, 16):
            dt = t(lambda i, K=K: chain(i, K), idx0)
            print(
                f"N={N:>8} K={K:>2}: {dt*1e3:8.2f}ms"
                f"  per-op {dt/K*1e3:6.2f}ms  ns/elem {dt/K/N*1e9:7.1f}"
            )

    print("=== row width scaling (N=262k, K=4 independent gathers) ===")
    N = 1 << 18
    idx = jax.random.randint(jax.random.key(4), (4, N), 0, V, jnp.int32)
    for name, table in (("(V,)", tab), ("(V,8)", tab8), ("(V,32)", tab32)):
        dt = t(lambda ix: sum(table[ix[k]].sum() for k in range(4)), idx)
        print(f"width {name:>6}: {dt*1e3:8.2f}ms")

    print("=== fusable elementwise chain (baseline) ===")
    x = jax.random.normal(jax.random.key(5), (N,), jnp.float32)
    for K in (1, 16, 64):
        def ew(x, K=K):
            for _ in range(K):
                x = x * 1.0001 + 0.1
            return x
        print(f"K={K:>3} elementwise: {t(ew, x)*1e3:8.2f}ms")

    print("=== scatter-add (backward-pass shape) ===")
    src = jax.random.normal(jax.random.key(6), (N, 3), jnp.float32)
    sidx = jax.random.randint(jax.random.key(7), (N,), 0, V, jnp.int32)
    dt = t(lambda s, i: jnp.zeros((V, 3), jnp.float32).at[i].add(s), src, sidx)
    print(f"scatter-add (N,3)->(V,3): {dt*1e3:8.2f}ms")
    dt = t(
        lambda s, i: jax.ops.segment_sum(s, i, num_segments=V), src, sidx
    )
    print(f"segment_sum (N,3)->(V,3): {dt*1e3:8.2f}ms")


if __name__ == "__main__":
    main()

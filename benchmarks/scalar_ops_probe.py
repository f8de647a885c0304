"""Probe: which scalar decode ops lower in Mosaic kernels on this chip.

Needed for quantized SMEM child boxes (bvh.wide): per-child decode is
scalar shifts/masks + either bitcast (bf16-pair unpack) or sitofp (u8
dequant). Run each candidate in its own tiny pallas_call so one failure
doesn't mask the others.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/scalar_ops_probe.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x, want):
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(x.shape, lambda: (0,),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
        got = float(jax.block_until_ready(out)[0, 0])
        ok = abs(got - want) < 1e-4 * max(abs(want), 1.0)
        print(f"{name:28s} {'OK' if ok else 'WRONG'} got={got} want={want}",
              flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def main():
    import numpy as np

    # 1.5f32 in the high bf16 half, 2.5 in the low half of one int32.
    f = np.float32([1.5, 2.5])
    u = f.view(np.uint32) >> 16
    packed = np.int32((u[0] << 16) | u[1])
    x = jnp.asarray([packed, 0], jnp.int32)

    def k_bitcast_hi(x_ref, o_ref):
        w = x_ref[0]
        hi = jax.lax.bitcast_convert_type(
            jnp.int32(w & jnp.int32(-65536)), jnp.float32
        )
        o_ref[...] = jnp.full((8, 128), hi, jnp.float32)

    def k_bitcast_lo(x_ref, o_ref):
        w = x_ref[0]
        lo = jax.lax.bitcast_convert_type(
            jnp.int32(w << 16), jnp.float32
        )
        o_ref[...] = jnp.full((8, 128), lo, jnp.float32)

    def k_sitofp(x_ref, o_ref):
        w = x_ref[0]
        v = ((w >> 16) & 255).astype(jnp.float32) * 0.5
        o_ref[...] = jnp.full((8, 128), v, jnp.float32)

    run("scalar bitcast i32->f32 hi", k_bitcast_hi, x, 1.5)
    run("scalar bitcast i32->f32 lo", k_bitcast_lo, x, 2.5)
    y = jnp.asarray([np.int32(200 << 16), 0], jnp.int32)
    run("scalar sitofp+mask", k_sitofp, y, 100.0)


if __name__ == "__main__":
    main()

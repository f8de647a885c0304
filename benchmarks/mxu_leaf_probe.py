"""MXU leaf-test prototype (VERDICT r3 ask #3): measure whether the
bilinear Möller–Trumbore form — per-triangle matrix A (16x4) so a leaf of
32 tris vs R rays is an (R,16)x(16,128) matmul — beats the production VPU
leaf stage, per ray-tri test, inside a Pallas kernel on this chip.

Workload unit: one leaf VISIT = 32 triangles tested against a 1024-ray
group (the production gating granularity), i.e. 32768 ray-tri tests.

Variants (all loop NV visits over NL distinct resident leaf tables):
  vpu        group-mode replica: 32 scalar-broadcast _mt_tri ops on the
             (8,128)-row group  (the production inner loop's cost shape)
  mxu_f32    (1024,16)x(16,128) f32 matmul + [U|V|T|D] column-group
             epilogue (32-lane slices, lane-padded)
  mxu_bf16   same, bf16 inputs / f32 accumulate
  mxu_bf16x4 4 visits per matmul: (1024,16)x(16,512) so the epilogue
             slices are full 128-lane (1024,128) tiles
  mm_only    the bf16x4 matmul with a trivial epilogue (separates matmul
             cost from epilogue cost)
  vpu_h      VPU variant testing only the first 16 tris per visit (the
             half-work baseline for the hybrid)
  hybrid     16 tris on the VPU + 16 tris via a (1024,16)x(16,64) bf16
             matmul per visit — measures whether Mosaic overlaps the
             scalar-broadcast VPU chain with MXU issue. If hybrid ~=
             max(vpu_h, mxu/2) the units overlap and a split leaf stage
             is a ~2x lever; if ~= vpu_h + mxu/2 they serialize.

Prints ns/visit and Gtests/s. A separate jnp-level pass checks the bf16
prefilter's conservativeness on real scene triangles: with the rank-1
norm tolerance it must have ZERO false negatives vs the f32 exact test;
the false-positive rate bounds the exact re-test work.

Run: PYTHONPATH=/root/.axon_site:src python benchmarks/mxu_leaf_probe.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

NL = int(os.environ.get("MXU_NL", "256"))   # resident distinct leaves
NV = int(os.environ.get("MXU_NV", "4096"))  # visits timed per launch
R = 1024          # rays per group (8 sublane-rows x 128 lanes)
C = 32            # tris per leaf
INTERPRET = os.environ.get("MXU_INTERPRET", "") == "1"
EPS_BF16 = 2.0 ** -8


def tri_matrices(v0, e1, e2):
    """(T,3)x3 -> A (T,16,4) bilinear MT: f·A = [u,v,t,1]*det with
    f = [d, o x d, o, 1, pad...] (16). Derivation verified exact vs the
    classic MT in this file's probe (rel err ~1e-16, see git log)."""
    T = v0.shape[0]
    n = np.cross(e1, e2)
    A = np.zeros((T, 16, 4), np.float32)
    A[:, 0:3, 0] = np.cross(v0, e2)
    A[:, 3:6, 0] = e2
    A[:, 0:3, 1] = -np.cross(v0, e1)
    A[:, 3:6, 1] = -e1
    A[:, 6:9, 2] = n
    A[:, 9, 2] = -np.einsum("tk,tk->t", v0, n)
    A[:, 0:3, 3] = -n
    return A


def ray_features(o, d):
    m = np.cross(o, d)
    f = np.zeros((o.shape[0], 16), np.float32)
    f[:, 0:3] = d
    f[:, 3:6] = m
    f[:, 6:9] = o
    f[:, 9] = 1.0
    return f


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    # tri clusters with realistic extents around ray origins
    v0 = rng.normal(size=(NL * C, 3)).astype(np.float32) * 2.0
    e1 = rng.normal(size=(NL * C, 3)).astype(np.float32) * 0.2
    e2 = rng.normal(size=(NL * C, 3)).astype(np.float32) * 0.2
    o = rng.normal(size=(R, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    A = tri_matrices(v0, e1, e2)          # (NL*C,16,4)
    f = ray_features(o, d)                # (R,16)
    # MXU layouts: per leaf, columns grouped [U(32)|V(32)|T(32)|D(32)]
    Ag = A.reshape(NL, C, 16, 4).transpose(0, 2, 3, 1)  # (NL,16,4,C)
    A_mxu = Ag.reshape(NL, 16, 4 * C)                   # col = out*32+tri
    # 4-leaf batched layout: [U of 4 leaves (128) | V(128) | T(128) | D(128)]
    # so every epilogue slice is a full 128-lane tile.
    A4 = (A.reshape(NL // 4, 4, C, 16, 4)
          .transpose(0, 3, 4, 1, 2)          # (NL/4,16,4out,4leaf,C)
          .reshape(NL // 4, 16, 4 * 4 * C))
    # hybrid: MXU table for the SECOND 16 tris of each leaf,
    # columns [U(16)|V(16)|T(16)|D(16)]
    Ah = (A.reshape(NL, C, 16, 4)[:, C // 2:]
          .transpose(0, 2, 3, 1)               # (NL,16,4,C/2)
          .reshape(NL, 16, 4 * (C // 2)))
    Ah = np.concatenate(
        [Ah, np.zeros((NL, 16, 128 - 4 * (C // 2)), np.float32)], axis=2)
    # tri scalar planes for the VPU replica: (NL*C, 9) v0/e1/e2
    tri9 = np.concatenate([v0, e1, e2], axis=1)
    # ray planes (8,128) per coordinate
    op = o.reshape(8, 128, 3).transpose(2, 0, 1).copy()
    dp = d.reshape(8, 128, 3).transpose(2, 0, 1).copy()
    return dict(
        A_mxu=jnp.asarray(A_mxu.reshape(NL * 16, 4 * C)),
        A_mxu4=jnp.asarray(A4.reshape(NL // 4 * 16, 16 * C)),
        A_h=jnp.asarray(Ah.reshape(NL * 16, 128)),
        f=jnp.asarray(f),
        tri9=jnp.asarray(tri9),
        op=jnp.asarray(op), dp=jnp.asarray(dp),
        v0=v0, e1=e1, e2=e2, o=o, d=d,
    )


def _epilogue(u, v, t, dd, best):
    """Pre-division MT accept test on matmul outputs (each (R,K))."""
    w = dd - u - v
    ud = u * dd
    vd = v * dd
    wd = w * dd
    td = t * dd
    d2 = dd * dd
    ok = (ud >= 0.0) & (vd >= 0.0) & (wd >= 0.0)
    ok &= (td > 1e-3 * d2) & (td < best * d2)
    return ok


def make_vpu(t_min=1e-3, c_vpu=C):
    from blink.kernels.traverse_pallas import _mt_tri

    def kernel(op_ref, dp_ref, tri_ref, out_ref):
        ox, oy, oz = op_ref[0], op_ref[1], op_ref[2]
        dx, dy, dz = dp_ref[0], dp_ref[1], dp_ref[2]
        out_ref[...] = jnp.full((8, 128), 1e30, jnp.float32)

        def visit(i, _):
            leaf = i % NL
            bt = out_ref[...]
            for j in range(c_vpu):
                # scalar reads of the tri record (the production kernel's
                # row-load+roll+extract chain collapses to this on SMEM;
                # here tri9 rows live in VMEM like trow does)
                s = leaf * C + j
                row = tri_ref[pl.ds(s, 1), :]
                t = _mt_tri(
                    ox, oy, oz, dx, dy, dz,
                    row[0, 0], row[0, 1], row[0, 2],
                    row[0, 3], row[0, 4], row[0, 5],
                    row[0, 6], row[0, 7], row[0, 8],
                    t_min, bt,
                )
                bt = jnp.minimum(bt, t)
            out_ref[...] = bt
            return 0

        jax.lax.fori_loop(0, NV, visit, 0)

    @jax.jit
    def run(op, dp, tri9):
        tri_pad = jnp.pad(tri9, ((0, 0), (0, 128 - 9)))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(op, dp, tri_pad)

    return run


def make_mxu(dtype, batch=1, mm_only=False):
    K = 4 * C * batch  # output columns per matmul

    def kernel(f_ref, a_ref, out_ref):
        out_ref[...] = jnp.full((8, 128), 1e30, jnp.float32)
        fb = f_ref[...]
        if dtype == "bf16":
            fb = fb.astype(jnp.bfloat16)
        acc = jnp.zeros((8, 128), jnp.float32)
        n_groups = NL // batch

        def visit(i, acc):
            g = i % n_groups
            a = a_ref[pl.ds(g * 16, 16), :]
            if dtype == "bf16":
                a = a.astype(jnp.bfloat16)
            out = jnp.dot(fb, a, preferred_element_type=jnp.float32)
            if mm_only:
                return acc + out[:8, :128]
            q = K // 4  # columns per output group
            u, v, t, dd = (out[:, 0:q], out[:, q:2 * q],
                           out[:, 2 * q:3 * q], out[:, 3 * q:4 * q])
            ok = _epilogue(u, v, t, dd, 1e4)
            # per-row any-survivor reduce at 8-tri granularity: the gate
            # for the exact VPU re-test (production integration shape).
            okf = ok.astype(jnp.float32)
            red = jnp.max(okf.reshape(R // 8, 8, q), axis=1)
            if q < 128:
                red = jnp.concatenate([red] * (128 // q), axis=1)
            return acc + red[:8, :128]

        acc = jax.lax.fori_loop(0, NV // batch, visit, acc)
        out_ref[...] = acc

    @jax.jit
    def run(f, a_mxu):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(f, a_mxu)

    return run


def make_hybrid(t_min=1e-3):
    """16 tris/visit on the VPU (scalar-broadcast _mt_tri chain) + 16
    tris/visit on the MXU ((1024,16)x(16,128) bf16 matmul, columns
    [U|V|T|D] each 16 wide + zero pad, with the probe's accept-test
    epilogue). One fori_loop body issues both; Mosaic decides overlap."""
    from blink.kernels.traverse_pallas import _mt_tri

    CH = C // 2

    def kernel(op_ref, dp_ref, tri_ref, f_ref, a_ref, out_ref):
        ox, oy, oz = op_ref[0], op_ref[1], op_ref[2]
        dx, dy, dz = dp_ref[0], dp_ref[1], dp_ref[2]
        out_ref[...] = jnp.full((8, 128), 1e30, jnp.float32)
        fb = f_ref[...].astype(jnp.bfloat16)
        acc = jnp.zeros((8, 128), jnp.float32)

        def visit(i, acc):
            leaf = i % NL
            # --- MXU half: tris [16, 32) of the leaf ---
            a = a_ref[pl.ds(leaf * 16, 16), :].astype(jnp.bfloat16)
            out = jnp.dot(fb, a, preferred_element_type=jnp.float32)
            u, v, t, dd = (out[:, 0:CH], out[:, CH:2 * CH],
                           out[:, 2 * CH:3 * CH], out[:, 3 * CH:4 * CH])
            ok = _epilogue(u, v, t, dd, 1e4)
            okf = ok.astype(jnp.float32)
            red = jnp.max(okf.reshape(R // 8, 8, CH), axis=1)
            red = jnp.concatenate([red] * (128 // CH), axis=1)
            acc = acc + red[:8, :128]
            # --- VPU half: tris [0, 16) of the leaf ---
            bt = out_ref[...]
            for j in range(CH):
                s = leaf * C + j
                row = tri_ref[pl.ds(s, 1), :]
                t = _mt_tri(
                    ox, oy, oz, dx, dy, dz,
                    row[0, 0], row[0, 1], row[0, 2],
                    row[0, 3], row[0, 4], row[0, 5],
                    row[0, 6], row[0, 7], row[0, 8],
                    t_min, bt,
                )
                bt = jnp.minimum(bt, t)
            out_ref[...] = bt
            return acc

        acc = jax.lax.fori_loop(0, NV, visit, acc)
        out_ref[...] = out_ref[...] + acc

    @jax.jit
    def run(op, dp, tri9, f, a_h):
        tri_pad = jnp.pad(tri9, ((0, 0), (0, 128 - 9)))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(op, dp, tri_pad, f, a_h)

    return run


def timeit(f, *a, reps=3):
    r = f(*a)
    chk = float(np.sum(np.asarray(r, np.float64)))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    return dt, chk


def conservativeness(data):
    """bf16 prefilter vs f32 exact on the same tris/rays (jnp level)."""
    f = np.asarray(data["f"])                      # (R,16)
    A = np.asarray(data["A_mxu"]).reshape(NL, 16, 4 * C)
    fb = jnp.asarray(f, jnp.bfloat16)
    Ab = jnp.asarray(A, jnp.bfloat16)
    out16 = np.asarray(jnp.einsum(
        "rk,lkc->lrc", fb, Ab, preferred_element_type=jnp.float32))
    out32 = np.einsum("rk,lkc->lrc", f, A)

    def unpack(o):
        return o[..., 0:C], o[..., C:2 * C], o[..., 2 * C:3 * C], o[..., 3 * C:]

    u, v, t, dd = unpack(out32)
    w = dd - u - v
    exact = ((u * dd >= 0) & (v * dd >= 0) & (w * dd >= 0)
             & (t * dd > 1e-3 * dd * dd) & (t * dd < 1e4 * dd * dd))
    # rank-1 conservative tolerance: err(X*D) <= c*eps*(|f|^2 |aX| |aD|)
    fn = np.linalg.norm(f, axis=1) ** 2                     # (R,)
    an = np.linalg.norm(A, axis=1)                          # (NL,4C)
    aU, aV, aT, aD = unpack(an[:, None, :])
    tolU = 8 * EPS_BF16 * fn[None, :, None] * (aU * aD)
    tolV = 8 * EPS_BF16 * fn[None, :, None] * (aV * aD)
    tolT = 8 * EPS_BF16 * fn[None, :, None] * (aT * aD + aD * aD * 1e4)
    u16, v16, t16, d16 = unpack(out16)
    w16 = d16 - u16 - v16
    tolW = tolU + tolV + 8 * EPS_BF16 * fn[None, :, None] * (aD * aD)
    pre = ((u16 * d16 >= -tolU) & (v16 * d16 >= -tolV)
           & (w16 * d16 >= -tolW)
           & (t16 * d16 > 1e-3 * d16 * d16 - tolT)
           & (t16 * d16 < 1e4 * d16 * d16 + tolT))
    fn_mask = exact & ~pre
    fp = (~exact & pre).mean()
    print(f"prefilter: exact-hit rate {exact.mean():.4f}, "
          f"false-neg {fn_mask.sum()} (MUST be 0), false-pos rate {fp:.4f}")
    return int(fn_mask.sum())


def main():
    sys.path.insert(0, "src")
    data = make_data()
    tests_per_visit = C * R
    total = NV * tests_per_visit
    print(f"workload: {NV} visits x {C} tris x {R} rays = {total/1e6:.0f}M tests")

    runs = {
        "vpu": (make_vpu(), (data["op"], data["dp"], data["tri9"])),
        "mxu_f32": (make_mxu("f32"), (data["f"], data["A_mxu"])),
        "mxu_bf16": (make_mxu("bf16"), (data["f"], data["A_mxu"])),
        "mxu_bf16x4": (make_mxu("bf16", batch=4), (data["f"], data["A_mxu4"])),
        "mm_only": (make_mxu("bf16", batch=4, mm_only=True),
                    (data["f"], data["A_mxu4"])),
        "vpu_h": (make_vpu(c_vpu=C // 2),
                  (data["op"], data["dp"], data["tri9"])),
        "hybrid": (make_hybrid(),
                   (data["op"], data["dp"], data["tri9"],
                    data["f"], data["A_h"])),
    }
    for name, (f, args) in runs.items():
        try:
            dt, chk = timeit(f, *args)
            print(f"{name:11s} {dt*1e3:8.2f} ms  {dt/NV*1e9:7.0f} ns/visit  "
                  f"{total/dt/1e9:7.1f} Gtests/s  chk={chk:.3e}", flush=True)
        except Exception as e:
            print(f"{name:11s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    conservativeness(data)


if __name__ == "__main__":
    main()

"""Pallas TPU BVH traversal kernels (SURVEY.md §2 "Stackless BVH traversal
kernel", §7.2.1; BASELINE.json:5 "stackless BVH traversal ... re-derived
for SIMD lanes").

TPU-native design — a *packet* reformulation of the per-thread GPU walk:

  - The VPU is 8x128 lanes with shared control flow; per-lane divergent
    tree walks would force per-lane gathers of node data (the pattern
    Mosaic handles worst). Instead each kernel instance owns a PACKET of
    RAY_ROWS x 128 rays held as (RAY_ROWS, 128) VMEM tiles, and a single
    SCALAR preorder cursor walks the skip-link BVH (bvh.types).
  - A node is entered iff ANY ray in the packet still needs it (slab test
    against each ray's current best t). The render pipeline feeds
    spatially tiled pixel packets (render.api) so the visited-node union
    stays near a single ray's path; wavefront compaction + sorting
    restores coherence for bounce rays.
  - Scalar access pattern (probed on this toolchain, see git history):
    Mosaic supports dynamic-SUBLANE row loads, dynamic lane ROLLs, and
    STATIC lane extraction — but not dynamic lane indexing. So node and
    triangle records are packed into lane-aligned slots:
       node n   -> row n//8,  lanes [(n%8)*16  .. +9): lo.xyz hi.xyz
                   skip first count   (ints stored exactly as f32 < 2^24)
       tri slot s -> row s//12, lanes [(s%12)*10 .. +10): v0 e1 e2 tid
    One row load + one roll brings a record to lane 0; attributes are then
    static extracts. This costs ~3 vector ops per record instead of ~19
    masked reductions.
  - The walk is a lax.while_loop on the scalar cursor; leaf triangle
    tests are lax.cond'ed on "any lane needs the leaf". The any-hit
    (shadow) variant early-exits once every lane is blocked.

The pure-JAX reference (kernels.traverse) computes identical results;
tests/test_pallas_interpret.py asserts parity in interpreter mode on CPU
and tests/tpu/test_pallas_parity.py on the real chip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blink.bvh.types import FlatBVH
from blink.core.struct import pytree_dataclass, static_field
from blink.kernels.types import T_MAX, T_MIN

Array = jnp.ndarray

LANES = 128
#: rays per packet = RAY_ROWS x 128. Bigger packets amortize the scalar
#: node walk over more rays at the price of a larger node-union; 32 rows
#: (4096 rays = a 32x128 pixel tile) benchmarked fastest on the v5e.
RAY_ROWS = 32
#: independent walks interleaved per kernel instance (latency hiding).
N_WALKS = 1
NODE_LANES = 16  # lanes reserved per node record (9 used)
NODES_PER_ROW = LANES // NODE_LANES  # 8
TRI_LANES = 10  # lanes per triangle record
TRIS_PER_ROW = LANES // TRI_LANES  # 12


@pytree_dataclass
class BVHPacked:
    """Lane-slot packed device layout of a FlatBVH (see module doc)."""

    nrow: Array  # (ceil(N/8), 128) f32 node records
    trow: Array  # (ceil(P/12), 128) f32 triangle records
    n_nodes: int = static_field(default=0)
    leaf_size: int = static_field(default=4)


def pack_bvh_planes(bvh: FlatBVH) -> BVHPacked:
    """One-time re-layout of BVH arrays into the lane-slot packed form.

    (Name kept from the earlier planar layout for API stability.)
    Padding slots parse as: node with the far-away EMPTY_BOX point box
    (always missed — see bvh.build.EMPTY_BOX) and skip == n_nodes
    (terminates); triangle with v0=e1=e2=0 (det==0 -> miss) and id -1.

    Record lanes 9-11 support the ORDERED (near-child-first, SMEM-stack)
    walk: rchild (preorder index of the right child = skip[node+1]),
    split axis (argmax child-center separation), and lower_first (1.0 if
    the LEFT child is on the lower side of that axis).
    """
    import numpy as np

    n = bvh.n_nodes
    # The ordered kernel's SMEM stack holds at most one pending far child
    # per ancestor level (+ the node being expanded): verify the tree's
    # depth fits STACK_CAP. build_sah_bvh bounds depth by construction
    # (_FORCE_BALANCE_DEPTH); this guards every other producer too.
    skip_np = np.asarray(bvh.skip)
    # Padding nodes (EMPTY_BOX point boxes at 1e30 — see bvh.build) can
    # never pass a slab test, so the walk never descends INTO them —
    # exclude them from the nesting model (uniformly-padded sharded chunks
    # put thousands of them in a tail chain whose naive nesting depth is
    # O(pad)).
    from blink.bvh.build import EMPTY_BOX as _EB

    unreachable = (
        (np.asarray(bvh.lo) >= _EB) & (np.asarray(bvh.hi) >= _EB)
    ).all(axis=1)
    stack: list[int] = []
    max_depth = 0
    for i in range(n):
        while stack and stack[-1] <= i:
            stack.pop()
        max_depth = max(max_depth, len(stack))
        if not unreachable[i]:
            stack.append(int(skip_np[i]))
    if max_depth + 2 > STACK_CAP:
        raise ValueError(
            f"BVH depth {max_depth} needs stack {max_depth + 2} > "
            f"STACK_CAP={STACK_CAP}; rebuild with a depth-bounded builder"
        )
    nrows = -(-n // NODES_PER_ROW)
    # Child/order metadata (host-side numpy, one-time).
    lo = np.asarray(bvh.lo)
    hi = np.asarray(bvh.hi)
    skip = np.asarray(bvh.skip)
    count = np.asarray(bvh.count)
    center = 0.5 * (lo + hi)
    node = np.arange(n)
    internal = (count == 0) & (skip > node + 1)
    left = np.minimum(node + 1, n - 1)
    rchild = np.where(internal, skip[left], 0)
    rsafe = np.clip(rchild, 0, n - 1)
    diff = center[rsafe] - center[left]
    axis = np.argmax(np.abs(diff), axis=1)
    lower_first = np.where(diff[node, axis] >= 0, 1.0, 0.0)
    rec = jnp.concatenate(
        [
            bvh.lo,
            bvh.hi,
            jnp.asarray(bvh.skip, jnp.float32)[:, None],
            jnp.asarray(bvh.first, jnp.float32)[:, None],
            jnp.asarray(bvh.count, jnp.float32)[:, None],
            jnp.asarray(rchild, jnp.float32)[:, None],
            jnp.asarray(axis, jnp.float32)[:, None],
            jnp.asarray(lower_first, jnp.float32)[:, None],
            jnp.zeros((n, NODE_LANES - 12), jnp.float32),
        ],
        axis=1,
    )  # (n, 16)
    # Padding node = far point box (always misses; see bvh.build.EMPTY_BOX
    # — inverted bounds would read as an infinite box under the slab swap).
    from blink.bvh.build import EMPTY_BOX

    pad_rec = jnp.concatenate(
        [
            jnp.full((1, 6), EMPTY_BOX, jnp.float32),
            jnp.full((1, 1), float(n), jnp.float32),
            jnp.zeros((1, NODE_LANES - 7), jnp.float32),
        ],
        axis=1,
    )
    pad_n = nrows * NODES_PER_ROW - n
    rec = jnp.concatenate([rec, jnp.tile(pad_rec, (pad_n, 1))])
    nrow = rec.reshape(nrows, LANES)

    p = bvh.tri_id.shape[0]
    prows = -(-p // TRIS_PER_ROW)
    trec = jnp.concatenate(
        [
            bvh.tv0,
            bvh.te1,
            bvh.te2,
            jnp.asarray(bvh.tri_id, jnp.float32)[:, None],
        ],
        axis=1,
    )  # (p, 10)
    pad_p = prows * TRIS_PER_ROW - p
    pad_t = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.float32), jnp.full((1, 1), -1.0, jnp.float32)],
        axis=1,
    )
    trec = jnp.concatenate([trec, jnp.tile(pad_t, (pad_p, 1))])
    # Rows must fill 120 of 128 lanes; pad each row's tail with zeros.
    trec = trec.reshape(prows, TRIS_PER_ROW * TRI_LANES)
    trow = jnp.concatenate(
        [trec, jnp.zeros((prows, LANES - TRIS_PER_ROW * TRI_LANES), jnp.float32)],
        axis=1,
    )
    return BVHPacked(
        nrow=nrow, trow=trow, n_nodes=n, leaf_size=bvh.leaf_size
    )


def _slab(ox, oy, oz, ix, iy, iz, t_min, t_max, lx, ly, lz, hx, hy, hz):
    """Vectorized slab test of one scalar box against the ray packet."""
    t0x = (lx - ox) * ix
    t1x = (hx - ox) * ix
    t0y = (ly - oy) * iy
    t1y = (hy - oy) * iy
    t0z = (lz - oz) * iz
    t1z = (hz - oz) * iz
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    # 0*inf NaN guard (origin exactly on a slab of a parallel ray).
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    return jnp.maximum(near, t_min) <= jnp.minimum(far, t_max)


def _mt_tri(ox, oy, oz, dx, dy, dz, v0x, v0y, v0z, e1x, e1y, e1z,
            e2x, e2y, e2z, t_min, t_max):
    """Möller–Trumbore of one scalar triangle vs the packet (exact 1/det —
    see kernels.triangle)."""
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    degen = det == 0.0
    inv = 1.0 / jnp.where(degen, 1.0, det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    valid = (
        ~degen & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= t_min) & (t <= t_max)
    )
    return jnp.where(valid, t, T_MAX)


def _make_kernel(n_nodes: int, leaf_size: int, any_hit: bool, t_min: float):
    def kernel(o_ref, d_ref, tfar_ref, nrow_ref, trow_ref,
               t_out_ref, prim_out_ref):
        def read_node(n):
            """Roll node record n to lane 0; return the (1,128) row."""
            row = nrow_ref[pl.ds(n // NODES_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(n % NODES_PER_ROW) * NODE_LANES, axis=1)

        def read_tri(s):
            row = trow_ref[pl.ds(s // TRIS_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(s % TRIS_PER_ROW) * TRI_LANES, axis=1)

        # N_WALKS independent sub-packets per kernel instance, stepped in
        # lockstep: each walk's serial chain (row load -> roll -> extract
        # -> slab -> any-reduce -> cursor select) is latency-bound, so
        # interleaving independent chains fills the pipeline bubbles.
        rays = []
        for w in range(N_WALKS):
            rs = slice(w * RAY_ROWS, (w + 1) * RAY_ROWS)
            ox = o_ref[0, rs]
            oy = o_ref[1, rs]
            oz = o_ref[2, rs]
            dx = d_ref[0, rs]
            dy = d_ref[1, rs]
            dz = d_ref[2, rs]
            rays.append(
                (ox, oy, oz, dx, dy, dz, 1.0 / dx, 1.0 / dy, 1.0 / dz)
            )

        def cond(c):
            running = jnp.bool_(False)
            for w in range(N_WALKS):
                node, best_t, prim = c[w]
                r = node < n_nodes
                if any_hit:
                    r = r & jnp.any(prim < 0)
                running = running | r
            return running

        def step(walk, c):
            ox, oy, oz, dx, dy, dz, ix, iy, iz = rays[walk]
            node, best_t, prim = c
            live = node < n_nodes
            nr = read_node(jnp.minimum(node, n_nodes - 1))
            need = _slab(
                ox, oy, oz, ix, iy, iz, t_min, best_t,
                nr[0, 0], nr[0, 1], nr[0, 2], nr[0, 3], nr[0, 4], nr[0, 5],
            ) & live
            if any_hit:
                need = need & (prim < 0)
            hit_any = jnp.any(need)
            cnt = jnp.int32(nr[0, 8])
            fst = jnp.int32(nr[0, 7])

            def leaf_body(carry):
                best_t, prim = carry
                for j in range(leaf_size):
                    tr = read_tri(fst + j)
                    t = _mt_tri(
                        ox, oy, oz, dx, dy, dz,
                        tr[0, 0], tr[0, 1], tr[0, 2],
                        tr[0, 3], tr[0, 4], tr[0, 5],
                        tr[0, 6], tr[0, 7], tr[0, 8],
                        t_min, best_t,
                    )
                    better = need & (j < cnt) & (t < best_t)
                    best_t = jnp.where(better, t, best_t)
                    prim = jnp.where(better, jnp.int32(tr[0, 9]), prim)
                return best_t, prim

            best_t, prim = jax.lax.cond(
                hit_any & (cnt > 0), leaf_body, lambda c: c, (best_t, prim)
            )
            nxt = jnp.where(hit_any, node + 1, jnp.int32(nr[0, 6]))
            node = jnp.where(live, nxt, node)
            return node, best_t, prim

        def body(c):
            return tuple(step(w, c[w]) for w in range(N_WALKS))

        init = tuple(
            (
                jnp.int32(0),
                jnp.minimum(
                    tfar_ref[w * RAY_ROWS : (w + 1) * RAY_ROWS], T_MAX
                ),
                jnp.full((RAY_ROWS, LANES), -1, jnp.int32),
            )
            for w in range(N_WALKS)
        )
        final = jax.lax.while_loop(cond, body, init)
        for w in range(N_WALKS):
            rs = slice(w * RAY_ROWS, (w + 1) * RAY_ROWS)
            t_out_ref[rs] = final[w][1]
            prim_out_ref[rs] = final[w][2]

    return kernel


#: SMEM traversal-stack capacity for the ordered walk. Perfect-tree depth
#: for 1M tris at leaf 16 is ~16; 64 covers any spec-scale scene.
STACK_CAP = 64
#: row groups for leaf-test culling in the "ordered_rg" variant: a leaf's
#: triangles are only tested against the 8-row sub-packets that actually
#: need the leaf (the packet's 'need' mask, reduced per group). Packets are
#: spatially tiled, so a small leaf's image footprint usually touches one
#: group — measured to skip 50-75% of delivered Möller–Trumbore work.
ROW_GROUPS = 4


def _make_kernel_ordered_rg(n_nodes: int, leaf_size: int, t_min: float):
    """Ordered walk with (a) best_t/prim kept in the OUTPUT refs as mutable
    state (the while_loop carries only the scalar stack pointer — shorter
    dependency chains than (32,128) vector carries), and (b) row-group
    culled leaf tests: triangle tests run per 8-row sub-packet under
    pl.when(any(need[group])), skipping sub-packets whose rays don't reach
    the leaf. Closest-hit only (the any-hit walk early-exits globally
    instead; see _make_kernel)."""
    GR = RAY_ROWS // ROW_GROUPS

    def kernel(o_ref, d_ref, tfar_ref, nrow_ref, trow_ref,
               t_out_ref, prim_out_ref, stack_ref):
        def read_node(n):
            row = nrow_ref[pl.ds(n // NODES_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(n % NODES_PER_ROW) * NODE_LANES, axis=1)

        def read_tri(s):
            row = trow_ref[pl.ds(s // TRIS_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(s % TRIS_PER_ROW) * TRI_LANES, axis=1)

        ox = o_ref[0]
        oy = o_ref[1]
        oz = o_ref[2]
        dx = d_ref[0]
        dy = d_ref[1]
        dz = d_ref[2]
        ix = 1.0 / dx
        iy = 1.0 / dy
        iz = 1.0 / dz
        sx = jnp.sum(dx) >= 0.0
        sy = jnp.sum(dy) >= 0.0
        sz = jnp.sum(dz) >= 0.0
        t_out_ref[...] = jnp.minimum(tfar_ref[...], T_MAX)
        prim_out_ref[...] = jnp.full((RAY_ROWS, LANES), -1, jnp.int32)
        stack_ref[0] = jnp.int32(0)  # push root

        def body(sp):
            sp1 = sp - 1
            node = stack_ref[sp1]
            nr = read_node(node)
            best_t = t_out_ref[...]
            need = _slab(
                ox, oy, oz, ix, iy, iz, t_min, best_t,
                nr[0, 0], nr[0, 1], nr[0, 2], nr[0, 3], nr[0, 4], nr[0, 5],
            )
            hit_any = jnp.any(need)
            cnt = jnp.int32(nr[0, 8])
            fst = jnp.int32(nr[0, 7])

            @pl.when(hit_any & (cnt > 0))
            def _():
                # One shared record fetch per triangle; each active row
                # group then reuses the (1,128) records via static extracts.
                trs = [read_tri(fst + j) for j in range(leaf_size)]
                for g in range(ROW_GROUPS):
                    rs = slice(g * GR, (g + 1) * GR)
                    gneed = need[rs]

                    @pl.when(jnp.any(gneed))
                    def _(rs=rs, gneed=gneed):
                        bt = t_out_ref[rs]
                        pr = prim_out_ref[rs]
                        gox, goy, goz = ox[rs], oy[rs], oz[rs]
                        gdx, gdy, gdz = dx[rs], dy[rs], dz[rs]
                        for j in range(leaf_size):
                            tr = trs[j]
                            t = _mt_tri(
                                gox, goy, goz, gdx, gdy, gdz,
                                tr[0, 0], tr[0, 1], tr[0, 2],
                                tr[0, 3], tr[0, 4], tr[0, 5],
                                tr[0, 6], tr[0, 7], tr[0, 8],
                                t_min, bt,
                            )
                            better = gneed & (j < cnt) & (t < bt)
                            bt = jnp.where(better, t, bt)
                            pr = jnp.where(better, jnp.int32(tr[0, 9]), pr)
                        t_out_ref[rs] = bt
                        prim_out_ref[rs] = pr

            left = node + 1
            right = jnp.int32(nr[0, 9])
            axis = jnp.int32(nr[0, 10])
            lower_first = nr[0, 11] > 0.5
            dpos = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            near_is_left = jnp.logical_xor(~dpos, lower_first)
            near = jnp.where(near_is_left, left, right)
            far = jnp.where(near_is_left, right, left)
            push = hit_any & (cnt == 0) & (right > 0)

            @pl.when(push)
            def _():
                stack_ref[sp1] = far
                stack_ref[sp1 + 1] = near

            return jnp.where(push, sp1 + 2, sp1)

        jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))

    return kernel


def _make_kernel_ordered(n_nodes: int, leaf_size: int, any_hit: bool,
                         t_min: float):
    """Near-child-first packet walk with an SMEM scalar stack.

    Visiting the child nearer along the packet's dominant direction first
    tightens best_t earlier, so later subtrees (and their leaf tests — the
    dominant cost) are culled more often than in the fixed preorder walk.
    The stack lives in SMEM scratch (dynamic scalar indexing is supported
    there); depth <= tree depth + 1.
    """

    def kernel(o_ref, d_ref, tfar_ref, nrow_ref, trow_ref,
               t_out_ref, prim_out_ref, stack_ref):
        def read_node(n):
            row = nrow_ref[pl.ds(n // NODES_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(n % NODES_PER_ROW) * NODE_LANES, axis=1)

        def read_tri(s):
            row = trow_ref[pl.ds(s // TRIS_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(s % TRIS_PER_ROW) * TRI_LANES, axis=1)

        ox = o_ref[0]
        oy = o_ref[1]
        oz = o_ref[2]
        dx = d_ref[0]
        dy = d_ref[1]
        dz = d_ref[2]
        ix = 1.0 / dx
        iy = 1.0 / dy
        iz = 1.0 / dz
        # Packet-dominant direction sign per axis (scalar bools).
        sx = jnp.sum(dx) >= 0.0
        sy = jnp.sum(dy) >= 0.0
        sz = jnp.sum(dz) >= 0.0
        best0 = jnp.minimum(tfar_ref[...], T_MAX)
        prim0 = jnp.full((RAY_ROWS * N_WALKS, LANES), -1, jnp.int32)
        stack_ref[0] = jnp.int32(0)  # push root

        def cond(c):
            sp, best_t, prim = c
            running = sp > 0
            if any_hit:
                running = running & jnp.any(prim < 0)
            return running

        def body(c):
            sp, best_t, prim = c
            sp1 = sp - 1
            node = stack_ref[sp1]
            nr = read_node(node)
            need = _slab(
                ox, oy, oz, ix, iy, iz, t_min, best_t,
                nr[0, 0], nr[0, 1], nr[0, 2], nr[0, 3], nr[0, 4], nr[0, 5],
            )
            if any_hit:
                need = need & (prim < 0)
            hit_any = jnp.any(need)
            cnt = jnp.int32(nr[0, 8])
            fst = jnp.int32(nr[0, 7])

            def leaf_body(carry):
                best_t, prim = carry
                for j in range(leaf_size):
                    tr = read_tri(fst + j)
                    t = _mt_tri(
                        ox, oy, oz, dx, dy, dz,
                        tr[0, 0], tr[0, 1], tr[0, 2],
                        tr[0, 3], tr[0, 4], tr[0, 5],
                        tr[0, 6], tr[0, 7], tr[0, 8],
                        t_min, best_t,
                    )
                    better = need & (j < cnt) & (t < best_t)
                    best_t = jnp.where(better, t, best_t)
                    prim = jnp.where(better, jnp.int32(tr[0, 9]), prim)
                return best_t, prim

            best_t, prim = jax.lax.cond(
                hit_any & (cnt > 0), leaf_body, lambda c: c, (best_t, prim)
            )

            # Internal hit: replace the popped slot with the FAR child and
            # push the NEAR child on top (popped next).
            left = node + 1
            right = jnp.int32(nr[0, 9])
            axis = jnp.int32(nr[0, 10])
            lower_first = nr[0, 11] > 0.5
            dpos = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
            near_is_left = jnp.logical_xor(~dpos, lower_first)
            near = jnp.where(near_is_left, left, right)
            far = jnp.where(near_is_left, right, left)
            push = hit_any & (cnt == 0) & (right > 0)

            @pl.when(push)
            def _():
                stack_ref[sp1] = far
                stack_ref[sp1 + 1] = near

            sp = jnp.where(push, sp1 + 2, sp1)
            return sp, best_t, prim

        _, best_t, prim = jax.lax.while_loop(
            cond, body, (jnp.int32(1), best0, prim0)
        )
        t_out_ref[...] = best_t
        prim_out_ref[...] = prim

    return kernel


@functools.lru_cache(maxsize=None)
def _make_kernel_wide(n_wide: int, leaf_size: int, t_min: float,
                      any_hit: bool, block_reads: bool = True,
                      rows: int = RAY_ROWS, row_groups: int = ROW_GROUPS,
                      leaf_mode: str = "group", quant: bool = False):
    """8-wide SMEM-node packet walk (see bvh.wide for the data layout and
    the design rationale). Per iteration: pop one wide node, slab-test all
    8 children (independent vector ops — the serial scalar chain is paid
    once per 8 boxes instead of once per box), test leaf children
    immediately with row-group culling, push hit internal children
    far-to-near so the nearest pops first.

    rows: packet height (rays per packet = rows x 128). Smaller packets
    shrink the packet-union of visited nodes/leaves (less shared work per
    ray) but amortize the scalar walk over fewer rays.
    row_groups: leaf-test culling granularity — each leaf is tested per
    (rows/row_groups)-row group only when some ray in the group needs it.
    More groups cut shared leaf work; each adds a branch per leaf visit.
    leaf_mode:
      "group" — the static row-group gating above;
      "row"   — ROW-GRANULAR gating (the big lever: benchmarks/union_sim
        measured 803 leaf tests/ray delivered at 1024-ray granularity vs
        220 at 128-ray granularity on the 200k scene). Per leaf visit,
        the ids of NEEDING 128-ray rows are compacted into SMEM scratch
        (one bitmask reduce + an unrolled scalar loop — no per-row
        vector branches, which measured catastrophically slow), then a
        dynamic fori over just those rows tests 8 TRIANGLES PER VECTOR
        OP: each 8-tri batch is an (8,16) tile with tris in SUBLANES
        (WideBVH.tbat), the row's rays broadcast across sublanes, one
        _mt_tri evaluates 8 tris x 128 rays, and a cross-sublane min
        with lowest-slot-on-tie reproduces the sequential kernel's
        first-slot-wins semantics exactly;
      "stream" — row-granular gating with tbat resident in HBM: a leaf
        visit only RECORDS (first batch, cnt, needing-row bitmask) and
        starts an async DMA of the leaf's (16,128) tbat window into a
        VMEM double buffer; the PREVIOUS pending leaf is processed (its
        row bitmask walked by a ctz loop, 8-tris-in-sublanes MT per
        needing row) while the current leaf's DMA is in flight. The one
        deferred visit keeps results EXACT: the recorded rows are a
        superset of the needing set at process time (best_t only
        tightens), processing order equals visit order (ties resolve
        identically), and the final pending leaf drains after the walk.
        This removes the VMEM residency that caps row mode at ~150k-tri
        chunks (tbat is ~512 B/batch; production 340k chunks need
        ~25 MB)."""
    groups = min(row_groups, rows)
    GR = rows // groups
    MAX_BATCH = -(-leaf_size // 8)

    def kernel(child_ref, *refs):
        if quant:
            # child_ref is the packed i32 table; nbox_ref the dequant
            # frames (WideBVH.nbox docstring).
            nbox_ref, perm_ref, o_ref, d_ref, tfar_ref = refs[:5]
            rest = refs[5:]
        else:
            perm_ref, o_ref, d_ref, tfar_ref = refs[:4]
            rest = refs[4:]
        if leaf_mode != "stream":
            trow_ref, rest = rest[0], rest[1:]
        if leaf_mode == "row":
            (bref_ref, tbat_ref, t_out_ref, prim_out_ref, stack_ref,
             rowidx_ref) = rest
        elif leaf_mode == "stream":
            (bref_ref, tbat_ref, t_out_ref, prim_out_ref, stack_ref,
             tile_buf, dma_sem, pend_ref) = rest
        else:
            t_out_ref, prim_out_ref, stack_ref = rest

        def read_tri(s):
            row = trow_ref[pl.ds(s // TRIS_PER_ROW, 1), :]
            return pltpu.roll(row, shift=-(s % TRIS_PER_ROW) * TRI_LANES, axis=1)

        if leaf_mode in ("row", "stream"):
            #: (rows,1) per-sublane bit weights for the needing-rows mask.
            #: int32, NOT uint32: Mosaic has no unsigned reductions (the
            #: jnp.sum below failed to lower). Distinct powers of two sum
            #: carry-free to the OR pattern even when bit 31 makes the
            #: int32 negative, and arithmetic >> plus &1 still extracts
            #: every bit below the sign extension exactly.
            rowbit = jnp.left_shift(
                jnp.int32(1),
                jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0),
            )

        ox = o_ref[0]
        oy = o_ref[1]
        oz = o_ref[2]
        dx = d_ref[0]
        dy = d_ref[1]
        dz = d_ref[2]
        ix = 1.0 / dx
        iy = 1.0 / dy
        iz = 1.0 / dz
        sx = jnp.sum(dx) >= 0.0
        sy = jnp.sum(dy) >= 0.0
        sz = jnp.sum(dz) >= 0.0
        octant = (
            jnp.int32(sx) + 2 * jnp.int32(sy) + 4 * jnp.int32(sz)
        )
        t_out_ref[...] = jnp.minimum(tfar_ref[...], T_MAX)
        prim_out_ref[...] = jnp.full((rows, LANES), -1, jnp.int32)
        stack_ref[0] = jnp.int32(0)  # push root
        if leaf_mode == "stream":
            pend_ref[3] = jnp.int32(0)  # leaves enqueued so far

        def cond(c):
            sp, alive = c
            return (sp > 0) & alive if any_hit else sp > 0

        def body(c):
            sp, alive = c
            sp = sp - 1
            node = stack_ref[sp]
            pm = perm_ref[node * 8 + octant]
            base = node * 64
            best_t = t_out_ref[...]
            if any_hit:
                unblocked = prim_out_ref[...] < 0
            if quant:
                b8 = node * 8
                nox = nbox_ref[b8]
                noy = nbox_ref[b8 + 1]
                noz = nbox_ref[b8 + 2]
                nsx = nbox_ref[b8 + 3]
                nsy = nbox_ref[b8 + 4]
                nsz = nbox_ref[b8 + 5]
            slots = []
            for k in range(8):  # near-first octant order
                c8 = (pm >> (3 * k)) & 7
                if quant:
                    f = (node * 8 + c8) * 3
                    w0 = child_ref[f]
                    w1 = child_ref[f + 1]
                    ref = child_ref[f + 2]
                    # cnt in bits 24-30 (<=127): sign bit clear, so the
                    # arithmetic shift is exact.
                    cnt = w0 >> 24
                    lx = nox + (w0 & 255).astype(jnp.float32) * nsx
                    ly = noy + ((w0 >> 8) & 255).astype(jnp.float32) * nsy
                    lz = noz + ((w0 >> 16) & 255).astype(jnp.float32) * nsz
                    hx = nox + (w1 & 255).astype(jnp.float32) * nsx
                    hy = noy + ((w1 >> 8) & 255).astype(jnp.float32) * nsy
                    hz = noz + ((w1 >> 16) & 255).astype(jnp.float32) * nsz
                else:
                    f = base + c8 * 8
                    lx, ly, lz = child_ref[f], child_ref[f + 1], child_ref[f + 2]
                    hx, hy, hz = child_ref[f + 3], child_ref[f + 4], child_ref[f + 5]
                    ref = jnp.int32(child_ref[f + 6])
                    cnt = jnp.int32(child_ref[f + 7])
                need = _slab(
                    ox, oy, oz, ix, iy, iz, t_min, best_t,
                    lx, ly, lz, hx, hy, hz,
                )
                if any_hit:
                    need = need & unblocked
                slots.append((jnp.any(need), need, ref, cnt, c8))

            if leaf_mode == "row":
                _leaf_row(slots, node)
            elif leaf_mode == "stream":
                _leaf_stream(slots, node)
            elif leaf_mode == "skip":
                pass  # TIMING ONLY: walk without leaf tests (wrong hits)
            else:
                _leaf_group(slots)

            # Internal children: push far-to-near (near pops first).
            for k in reversed(range(8)):
                hit_k, need, ref, cnt, _c8 = slots[k]
                push = hit_k & (cnt == 0) & (ref > 0)

                @pl.when(push)
                def _(ref=ref, sp=sp):
                    stack_ref[sp] = ref

                sp = jnp.where(push, sp + 1, sp)
            if any_hit:
                # Early exit once every ray is blocked (shadow semantics).
                alive = jnp.any(prim_out_ref[...] < 0)
            return sp, alive

        def _leaf_row(slots, node):
            """Row-granular leaf tests (see leaf_mode docstring)."""
            for k in range(8):
                hit_k, need, ref, cnt, c8 = slots[k]

                @pl.when(hit_k & (cnt > 0))
                def _(need=need, cnt=cnt, c8=c8):
                    bb = bref_ref[node * 8 + c8]
                    nb = (cnt + 7) // 8
                    rowneed = jnp.any(need, axis=1, keepdims=True)
                    bits = jnp.sum(
                        jnp.where(rowneed, rowbit, jnp.int32(0))
                    )
                    m = jnp.int32(0)
                    for rr in range(rows):
                        hit_r = ((bits >> jnp.int32(rr))
                                 & jnp.int32(1)) > 0

                        @pl.when(hit_r)
                        def _(rr=rr, m=m):
                            rowidx_ref[m] = jnp.int32(rr)

                        m = jnp.where(hit_r, m + 1, m)

                    def row_body(j, _):
                        r = rowidx_ref[j]
                        rox = jnp.broadcast_to(
                            o_ref[0, pl.ds(r, 1), :], (8, LANES)
                        )
                        roy = jnp.broadcast_to(
                            o_ref[1, pl.ds(r, 1), :], (8, LANES)
                        )
                        roz = jnp.broadcast_to(
                            o_ref[2, pl.ds(r, 1), :], (8, LANES)
                        )
                        rdx = jnp.broadcast_to(
                            d_ref[0, pl.ds(r, 1), :], (8, LANES)
                        )
                        rdy = jnp.broadcast_to(
                            d_ref[1, pl.ds(r, 1), :], (8, LANES)
                        )
                        rdz = jnp.broadcast_to(
                            d_ref[2, pl.ds(r, 1), :], (8, LANES)
                        )
                        cur_t = t_out_ref[pl.ds(r, 1), :]
                        bt0 = jnp.broadcast_to(cur_t, (8, LANES))

                        def mt_batch(bi, bt8):
                            B = bb + bi
                            blk = tbat_ref[pl.ds(8 * (B // 8), 8), :]
                            blk = pltpu.roll(
                                blk, shift=-(B % 8) * 16, axis=1
                            )
                            t8 = _mt_tri(
                                rox, roy, roz, rdx, rdy, rdz,
                                blk[:, 0:1], blk[:, 1:2], blk[:, 2:3],
                                blk[:, 3:4], blk[:, 4:5], blk[:, 5:6],
                                blk[:, 6:7], blk[:, 7:8], blk[:, 8:9],
                                t_min, bt8,
                            )
                            return t8, blk

                        if any_hit:
                            # Shadow semantics need only a BOOLEAN: skip the
                            # winner/tie-break machinery (3 wheres per batch
                            # + 3 cross-sublane reduces) and never shrink
                            # t_out — blocked lanes leave the walk through
                            # the `unblocked` gate, and a hit against the
                            # original t_far is exactly "occluded".
                            # int32 carry, not bool: Mosaic miscompiles a
                            # loop-carried i1 vector OR'd with a fresh
                            # compare (vpad<32> mask-layout mismatch,
                            # internal verifier error on-chip 2026-08-19).
                            def batch_body(bi, hit):
                                t8, _ = mt_batch(bi, bt0)
                                return jnp.maximum(
                                    hit, (t8 < bt0).astype(jnp.int32)
                                )

                            hit8 = jax.lax.fori_loop(
                                0, nb, batch_body,
                                jnp.zeros((8, LANES), jnp.int32),
                            )
                            hit_any = (
                                jnp.max(hit8, axis=0, keepdims=True) > 0
                            )
                            cur_p = prim_out_ref[pl.ds(r, 1), :]
                            prim_out_ref[pl.ds(r, 1), :] = jnp.where(
                                hit_any, jnp.int32(1), cur_p
                            )
                            return 0

                        gid0 = jnp.full((8, LANES), -1.0, jnp.float32)
                        sl0 = jnp.full((8, LANES), 1e9, jnp.float32)

                        def batch_body(bi, carry):
                            bt8, gid8, sl8 = carry
                            t8, blk = mt_batch(bi, bt8)
                            win = t8 < bt8
                            bt8 = jnp.where(win, t8, bt8)
                            gid8 = jnp.where(win, blk[:, 9:10], gid8)
                            sl8 = jnp.where(win, blk[:, 10:11], sl8)
                            return bt8, gid8, sl8

                        bt8, gid8, sl8 = jax.lax.fori_loop(
                            0, nb, batch_body, (bt0, gid0, sl0)
                        )
                        tmin = jnp.min(bt8, axis=0, keepdims=True)
                        is_min = bt8 <= tmin
                        sl_sel = jnp.min(
                            jnp.where(is_min, sl8, 1e9),
                            axis=0, keepdims=True,
                        )
                        gid_sel = jnp.min(
                            jnp.where(
                                is_min & (sl8 <= sl_sel), gid8, 1e9
                            ),
                            axis=0, keepdims=True,
                        )
                        better = tmin < cur_t
                        t_out_ref[pl.ds(r, 1), :] = jnp.where(
                            better, tmin, cur_t
                        )
                        cur_p = prim_out_ref[pl.ds(r, 1), :]
                        prim_out_ref[pl.ds(r, 1), :] = jnp.where(
                            better, gid_sel.astype(jnp.int32), cur_p
                        )
                        return 0

                    jax.lax.fori_loop(0, m, row_body, 0)

        def _ctz(lb):
            """Index of the (single) set bit of lb — 5-step binary search.
            Scalar int32 ops only (Mosaic has no scalar ctz/clz); exact
            for bit 31 (INT_MIN): every mask below has bit31 clear."""
            r = jnp.int32(0)
            r += jnp.where((lb & jnp.int32(0x0000FFFF)) == 0, 16, 0)
            r += jnp.where((lb & jnp.int32(0x00FF00FF)) == 0, 8, 0)
            r += jnp.where((lb & jnp.int32(0x0F0F0F0F)) == 0, 4, 0)
            r += jnp.where((lb & jnp.int32(0x33333333)) == 0, 2, 0)
            r += jnp.where((lb & jnp.int32(0x55555555)) == 0, 1, 0)
            return r

        def _process_pending(slot):
            """Wait the pending leaf's DMA and run its row-granular tests
            from the VMEM tile buffer (see leaf_mode='stream')."""
            bb = pend_ref[0]
            cnt = pend_ref[1]
            row0 = 8 * (bb // 8)
            pltpu.make_async_copy(
                tbat_ref.at[pl.ds(row0, 16), :],
                tile_buf.at[pl.ds(slot * 16, 16), :],
                dma_sem.at[slot],
            ).wait()
            nb = (cnt + 7) // 8
            loc0 = jax.lax.rem(bb, jnp.int32(8))

            def read_bat(bi):
                """Batch bi of the pending leaf, rolled to lanes 0-15."""
                loc = loc0 + bi
                blk = tile_buf[
                    pl.ds(slot * 16 + 8 * (loc // 8), 8), :
                ]
                return pltpu.roll(
                    blk, shift=-jax.lax.rem(loc, jnp.int32(8)) * 16, axis=1
                )

            def row_step(bits):
                lb = bits & (-bits)
                r = _ctz(lb)
                rox = jnp.broadcast_to(o_ref[0, pl.ds(r, 1), :], (8, LANES))
                roy = jnp.broadcast_to(o_ref[1, pl.ds(r, 1), :], (8, LANES))
                roz = jnp.broadcast_to(o_ref[2, pl.ds(r, 1), :], (8, LANES))
                rdx = jnp.broadcast_to(d_ref[0, pl.ds(r, 1), :], (8, LANES))
                rdy = jnp.broadcast_to(d_ref[1, pl.ds(r, 1), :], (8, LANES))
                rdz = jnp.broadcast_to(d_ref[2, pl.ds(r, 1), :], (8, LANES))
                cur_t = t_out_ref[pl.ds(r, 1), :]
                bt0 = jnp.broadcast_to(cur_t, (8, LANES))

                def mt_batch(bi, bt8):
                    blk = read_bat(bi)
                    t8 = _mt_tri(
                        rox, roy, roz, rdx, rdy, rdz,
                        blk[:, 0:1], blk[:, 1:2], blk[:, 2:3],
                        blk[:, 3:4], blk[:, 4:5], blk[:, 5:6],
                        blk[:, 6:7], blk[:, 7:8], blk[:, 8:9],
                        t_min, bt8,
                    )
                    return t8, blk

                if any_hit:
                    # Boolean-only shadow semantics; int32 carry (Mosaic
                    # miscompiles loop-carried i1 vectors — see _leaf_row).
                    def batch_body(bi, hit):
                        t8, _ = mt_batch(bi, bt0)
                        return jnp.maximum(
                            hit, (t8 < bt0).astype(jnp.int32)
                        )

                    hit8 = jax.lax.fori_loop(
                        0, nb, batch_body, jnp.zeros((8, LANES), jnp.int32)
                    )
                    hit_any_r = jnp.max(hit8, axis=0, keepdims=True) > 0
                    cur_p = prim_out_ref[pl.ds(r, 1), :]
                    prim_out_ref[pl.ds(r, 1), :] = jnp.where(
                        hit_any_r, jnp.int32(1), cur_p
                    )
                    return bits & (bits - 1)

                gid0 = jnp.full((8, LANES), -1.0, jnp.float32)
                sl0 = jnp.full((8, LANES), 1e9, jnp.float32)

                def batch_body(bi, carry):
                    bt8, gid8, sl8 = carry
                    t8, blk = mt_batch(bi, bt8)
                    win = t8 < bt8
                    bt8 = jnp.where(win, t8, bt8)
                    gid8 = jnp.where(win, blk[:, 9:10], gid8)
                    sl8 = jnp.where(win, blk[:, 10:11], sl8)
                    return bt8, gid8, sl8

                bt8, gid8, sl8 = jax.lax.fori_loop(
                    0, nb, batch_body, (bt0, gid0, sl0)
                )
                tmin = jnp.min(bt8, axis=0, keepdims=True)
                is_min = bt8 <= tmin
                sl_sel = jnp.min(
                    jnp.where(is_min, sl8, 1e9), axis=0, keepdims=True
                )
                gid_sel = jnp.min(
                    jnp.where(is_min & (sl8 <= sl_sel), gid8, 1e9),
                    axis=0, keepdims=True,
                )
                better = tmin < cur_t
                t_out_ref[pl.ds(r, 1), :] = jnp.where(better, tmin, cur_t)
                cur_p = prim_out_ref[pl.ds(r, 1), :]
                prim_out_ref[pl.ds(r, 1), :] = jnp.where(
                    better, gid_sel.astype(jnp.int32), cur_p
                )
                return bits & (bits - 1)

            jax.lax.while_loop(lambda b: b != 0, row_step, pend_ref[2])

        def _leaf_stream(slots, node):
            """Enqueue leaf children: start the tbat-window DMA, process
            the previous pending leaf while it flies (see leaf_mode
            docstring)."""
            for k in range(8):
                hit_k, need, ref, cnt, c8 = slots[k]

                @pl.when(hit_k & (cnt > 0))
                def _(need=need, cnt=cnt, c8=c8):
                    bb = bref_ref[node * 8 + c8]
                    rowneed = jnp.any(need, axis=1, keepdims=True)
                    bits = jnp.sum(
                        jnp.where(rowneed, rowbit, jnp.int32(0))
                    )
                    pc = pend_ref[3]
                    slot = jax.lax.rem(pc, jnp.int32(2))
                    pltpu.make_async_copy(
                        tbat_ref.at[pl.ds(8 * (bb // 8), 16), :],
                        tile_buf.at[pl.ds(slot * 16, 16), :],
                        dma_sem.at[slot],
                    ).start()

                    @pl.when(pc > 0)
                    def _():
                        _process_pending(1 - slot)

                    pend_ref[0] = bb
                    pend_ref[1] = cnt
                    pend_ref[2] = bits
                    pend_ref[3] = pc + 1

        def _leaf_group(slots):
            # Leaf children: tested at the parent visit (no stack traffic).
            # Triangle records are read in blocks of 8 slots, each block
            # gated on cnt reaching it — the adaptive collapse (bvh.wide)
            # produces many short leaves, and ungated unrolls would pay
            # leaf_size row-load+rolls per visit regardless of cnt.
            for k in range(8):
                hit_k, need, ref, cnt, _c8 = slots[k]

                @pl.when(hit_k & (cnt > 0))
                def _(need=need, ref=ref, cnt=cnt):
                    blk = 8 if block_reads else leaf_size
                    for b0 in range(0, leaf_size, blk):
                        nblk = min(blk, leaf_size - b0)

                        @pl.when(cnt > b0)
                        def _(b0=b0, nblk=nblk):
                            trs = [
                                read_tri(ref + b0 + j) for j in range(nblk)
                            ]
                            for g in range(groups):
                                rs = slice(g * GR, (g + 1) * GR)
                                gneed = need[rs]

                                @pl.when(jnp.any(gneed))
                                def _(rs=rs, gneed=gneed, b0=b0, nblk=nblk):
                                    bt = t_out_ref[rs]
                                    pr = prim_out_ref[rs]
                                    gox, goy, goz = ox[rs], oy[rs], oz[rs]
                                    gdx, gdy, gdz = dx[rs], dy[rs], dz[rs]
                                    # The block's MT tests are evaluated
                                    # INDEPENDENTLY against the block-entry
                                    # best-t, then merged in slot order.
                                    # Identical result to a carried best-t
                                    # (strict < in the merge preserves
                                    # first-slot-wins on exact ties; a later
                                    # tri admitted by the stale bound loses
                                    # the merge) but the ~35-op MT chains no
                                    # longer depend on each other, so the
                                    # VPU pipeline fills instead of stalling
                                    # on each tri's latency.
                                    t_js = []
                                    for j in range(nblk):
                                        tr = trs[j]
                                        t_js.append(_mt_tri(
                                            gox, goy, goz, gdx, gdy, gdz,
                                            tr[0, 0], tr[0, 1], tr[0, 2],
                                            tr[0, 3], tr[0, 4], tr[0, 5],
                                            tr[0, 6], tr[0, 7], tr[0, 8],
                                            t_min, bt,
                                        ))
                                    for j in range(nblk):
                                        t = t_js[j]
                                        better = (
                                            gneed & (b0 + j < cnt) & (t < bt)
                                        )
                                        bt = jnp.where(better, t, bt)
                                        pr = jnp.where(
                                            better,
                                            jnp.int32(trs[j][0, 9]), pr,
                                        )
                                    t_out_ref[rs] = bt
                                    prim_out_ref[rs] = pr

        jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.bool_(True)))
        if leaf_mode == "stream":
            # Drain the last pending leaf (its DMA is in flight).
            @pl.when(pend_ref[3] > 0)
            def _():
                _process_pending(
                    jax.lax.rem(pend_ref[3] - 1, jnp.int32(2)))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "t_min", "interpret", "rows", "row_groups"),
)
def _traverse_wide(
    o: Array,
    d: Array,
    t_far: Array,
    wide,
    any_hit: bool = False,
    t_min: float = T_MIN,
    interpret: bool | None = None,
    rows: int = RAY_ROWS,
    row_groups: int = ROW_GROUPS,
):
    """Single-chunk wrapper: pack rays -> packed kernel -> unpack."""
    n = o.shape[0]
    o_t, d_t, tf_t, g = _pack_rays(o, d, t_far, rows=rows)
    t_out, prim_out = _traverse_wide_packed(
        o_t, d_t, tf_t, wide, any_hit=any_hit, t_min=t_min,
        interpret=interpret, rows=rows, row_groups=row_groups,
    )
    return t_out.reshape(-1)[:n], prim_out.reshape(-1)[:n]


def _traverse_wide_packed(
    o_t: Array,
    d_t: Array,
    tf_t: Array,
    wide,
    any_hit: bool = False,
    t_min: float = T_MIN,
    interpret: bool | None = None,
    rows: int = RAY_ROWS,
    row_groups: int = ROW_GROUPS,
    leaf_mode: str = "group",
):
    """pallas_call wrapper for the wide kernel on PRE-PACKED rays
    (o_t/d_t (3, G*rows, 128), tf_t (G*rows, 128) — see _pack_rays).

    Node/perm tables ride in SMEM (scalar memory) — the walk reads them
    with ~1-cycle scalar loads instead of the VMEM row-load + roll +
    extract dance. Chunked callers MUST use this form and keep the
    best-t threading in packed layout: packing per chunk call costs ~3
    un-fusable (N,3)->(3,N) relayout ops at ~2-3ms each on this chip —
    at 9 chunks that fixed cost (~45ms/frame at 512^2) exceeded the
    entire walk time."""
    interpret = _resolve_interpret(interpret)
    o_t, d_t, tf_t = jax.lax.stop_gradient((o_t, d_t, tf_t))
    wide = jax.lax.stop_gradient(wide)
    g = o_t.shape[1] // rows
    if leaf_mode in ("row", "stream") and wide.bref is None:
        raise ValueError(f"leaf_mode='{leaf_mode}' needs a WideBVH built "
                         "with bref/tbat (rebuild with current bvh.wide)")
    if leaf_mode in ("row", "stream") and rows > 32:
        # The needing-row compaction packs one bit per row into a single
        # uint32 bitmask (rowbit = 1 << iota(rows)); rows 32+ would be
        # silently dropped from leaf testing (ADVICE r2).
        raise ValueError(
            f"leaf_mode='{leaf_mode}' supports rows <= 32, got {rows}")
    quant = bool(getattr(wide, "quant", False))
    kernel = _make_kernel_wide(
        wide.n_wide, wide.leaf_size, t_min, any_hit, wide.block_reads,
        rows=rows, row_groups=row_groups, leaf_mode=leaf_mode, quant=quant,
    )
    ray3 = pl.BlockSpec(
        (3, rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ray1 = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def whole(arr: Array, space) -> pl.BlockSpec:
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=space
        )

    in_specs = [whole(wide.child, pltpu.SMEM)]
    inputs = [wide.child]
    if quant:
        in_specs.append(whole(wide.nbox, pltpu.SMEM))
        inputs.append(wide.nbox)
    in_specs += [
        whole(wide.perm, pltpu.SMEM),
        ray3,
        ray3,
        ray1,
    ]
    inputs += [wide.perm, o_t, d_t, tf_t]
    if leaf_mode != "stream":
        # stream mode reads triangles only through the tbat DMA windows;
        # dropping trow frees ~14.5 MB of VMEM at production chunk sizes.
        in_specs.append(whole(wide.trow, pltpu.VMEM))
        inputs.append(wide.trow)
    scratch = [pltpu.SMEM((wide.max_stack,), jnp.int32)]
    if leaf_mode == "row":
        in_specs += [
            whole(wide.bref, pltpu.SMEM),
            whole(wide.tbat, pltpu.VMEM),
        ]
        inputs += [wide.bref, wide.tbat]
        scratch.append(pltpu.SMEM((rows,), jnp.int32))  # rowidx scratch
    elif leaf_mode == "stream":
        in_specs += [
            whole(wide.bref, pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tbat stays in HBM
        ]
        inputs += [wide.bref, wide.tbat]
        scratch += [
            pltpu.VMEM((32, LANES), jnp.float32),  # 2 x (16,128) tiles
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((4,), jnp.int32),  # pending (bb, cnt, bits, count)
        ]
    vma = _vma_of(o_t, d_t, tf_t, wide.child, wide.trow)
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=(ray1, ray1),
        out_shape=(
            jax.ShapeDtypeStruct((g * rows, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((g * rows, LANES), jnp.int32, vma=vma),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs)
    return t_out, prim_out


def _pack_rays(o: Array, d: Array, t_far: Array, rows: int = RAY_ROWS):
    """Pad to a (N_WALKS x packet) multiple; (n,3) -> (3, G*rows, 128)."""
    n = o.shape[0]
    packet = rows * LANES * N_WALKS
    g = -(-n // packet) * N_WALKS  # number of rows-row groups
    pad = g * rows * LANES - n
    o32 = jnp.asarray(o, jnp.float32)
    d32 = jnp.asarray(d, jnp.float32)
    tf = jnp.asarray(jnp.broadcast_to(t_far, (n,)), jnp.float32)
    if pad:
        # Padding rays: t_far=0 < t_min means the slab test can never pass
        # for them, so they record no hits and don't extend the walk.
        o32 = jnp.concatenate([o32, jnp.zeros((pad, 3), jnp.float32)])
        d32 = jnp.concatenate([d32, jnp.ones((pad, 3), jnp.float32)])
        tf = jnp.concatenate([tf, jnp.zeros((pad,), jnp.float32)])
    o_t = o32.T.reshape(3, g * rows, LANES)
    d_t = d32.T.reshape(3, g * rows, LANES)
    tf_t = tf.reshape(g * rows, LANES)
    return o_t, d_t, tf_t, g


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "t_min", "interpret", "ordered", "variant"),
)
def _traverse_pallas(
    o: Array,
    d: Array,
    t_far: Array,
    packed: BVHPacked,
    any_hit: bool = False,
    t_min: float = T_MIN,
    interpret: bool | None = None,
    ordered: bool = False,
    variant: str | None = None,
):
    # Topology oracle: pallas_call has no AD rule, and none is wanted —
    # traversal outputs integers at fixed topology (SURVEY.md §3.2).
    # Severing the inputs keeps value_and_grad from linearizing the kernel
    # when rays/shadow origins are themselves differentiated values.
    interpret = _resolve_interpret(interpret)
    o, d, t_far = jax.lax.stop_gradient((o, d, t_far))
    packed = jax.lax.stop_gradient(packed)
    n = o.shape[0]
    o_t, d_t, tf_t, g = _pack_rays(o, d, t_far)

    if variant is None:
        variant = "ordered" if ordered else "skip"
    if variant == "ordered_rg":
        assert not any_hit, "ordered_rg is closest-hit only"
        kernel = _make_kernel_ordered_rg(
            packed.n_nodes, packed.leaf_size, t_min
        )
        scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32)]
    elif variant == "ordered":
        kernel = _make_kernel_ordered(
            packed.n_nodes, packed.leaf_size, any_hit, t_min
        )
        scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32)]
    else:
        kernel = _make_kernel(packed.n_nodes, packed.leaf_size, any_hit, t_min)
        scratch = []
    rows = RAY_ROWS * N_WALKS
    ray3 = pl.BlockSpec(
        (3, rows, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    ray1 = pl.BlockSpec(
        (rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def whole(arr: Array) -> pl.BlockSpec:
        # Entire array resident in VMEM; identical block every grid step so
        # the pipeline fetches it once.
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    vma = _vma_of(o_t, d_t, tf_t, packed.nrow, packed.trow)
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid=(g // N_WALKS,),
        in_specs=[ray3, ray3, ray1, whole(packed.nrow), whole(packed.trow)],
        out_specs=(ray1, ray1),
        out_shape=(
            jax.ShapeDtypeStruct((g * RAY_ROWS, LANES), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((g * RAY_ROWS, LANES), jnp.int32, vma=vma),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(o_t, d_t, tf_t, packed.nrow, packed.trow)
    return t_out.reshape(-1)[:n], prim_out.reshape(-1)[:n]


#: production closest-hit kernel variant (see _make_kernel_ordered_rg).
CLOSEST_VARIANT = "ordered_rg"


def _vma_of(*xs):
    """Union of the inputs' varying-manual-axes — inside jax.shard_map the
    pallas_call out_shapes must declare how outputs vary across the mesh
    (outputs vary wherever any input does; the kernel is pointwise in the
    mesh). Empty outside shard_map."""
    s: set = set()
    for x in xs:
        s |= set(getattr(jax.typeof(x), "vma", ()) or ())
    return frozenset(s)


# NOTE (probed, jax 0.9 hlo_interpreter): pallas interpret mode under
# shard_map only supports AXIS-VARYING kernel inputs when their block
# slicing is trivial (replicated rays + varying whole-array tables, the
# dist.scene_shard shape). Grid-blocked VARYING ray inputs fail vma
# checking inside the interpreter's own dynamic_slice discharge, and
# pcast-aligning the inputs cannot fix it (the interpreter's slice
# indices are non-varying by construction) — it only breaks the
# working replicated-ray case. The Mosaic (on-chip) path has no such
# limitation; tests/tpu/test_dist_chip.py covers dist+pallas there.


def _resolve_interpret(interpret):
    """interpret=None means auto: Mosaic on TPU, interpreter elsewhere.

    This makes the pallas backend runnable on any platform — CPU CI and
    the gradient-parity tests exercise the exact production call graph
    (chunked multi-pass, t-threading, refine) with only the kernel body
    interpreted."""
    if interpret is None:
        import jax

        return jax.default_backend() != "tpu"
    return interpret


def traverse_closest_pallas(
    o: Array, d: Array, bvh, t_min: float = T_MIN, interpret: bool | None = None,
    t_far: Array | None = None, variant: str = CLOSEST_VARIANT,
):
    """Closest hit: (t, prim) with prim==-1 on miss (or no hit under the
    optional per-ray t_far — used by the chunked multi-pass traversal,
    which threads the running best t through passes). Matches
    kernels.traverse.traverse_closest exactly."""
    packed = bvh if isinstance(bvh, BVHPacked) else pack_bvh_planes(bvh)
    if t_far is None:
        t_far = jnp.full((o.shape[0],), T_MAX, jnp.float32)
    t, prim = _traverse_pallas(
        o, d, t_far, packed, any_hit=False, t_min=t_min, interpret=interpret,
        variant=variant,
    )
    return jax.lax.stop_gradient(t), prim


#: max triangles whose packed rows (+ node rows) comfortably fit VMEM.
CHUNK_TRIS = 120_000


def _chunked_sah_trees(tris, leaf_size: int, chunk_tris: int,
                       order_from=None, spatial: bool = False):
    """Morton-partition triangles into VMEM-sized chunks; one SAH FlatBVH
    per chunk with GLOBAL triangle ids. Chunks are contiguous Morton
    ranges, hence spatially compact: a packet that misses a chunk's root
    box pays exactly one node visit for that chunk.

    order_from: optional (3,) point (typically the camera origin at build
    time). When given, chunks are sorted near-to-far from it: the
    sequential multi-pass traversal threads best-t between chunk passes,
    so visiting the chunk most primary rays hit FIRST makes later passes'
    walks and leaf tests prune against a tight bound instead of T_MAX
    (Morton order is spatially arbitrary w.r.t. view depth). Exactness is
    unaffected — every chunk is still visited, order only moves work to
    the slab/early-out gates."""
    import numpy as np

    from blink.bvh.build import _morton3
    from blink.bvh.sah import build_sah_bvh
    from blink.scene.scene import Triangles

    if spatial:
        from blink.bvh.sbvh import build_sbvh as _builder
    else:
        _builder = build_sah_bvh

    v = np.asarray(tris.verts, np.float32)
    idx = np.asarray(tris.idx, np.int64)
    T = idx.shape[0]
    if T <= chunk_tris:
        # Binned-SAH trees cut packet node/leaf visits ~15-30% vs the
        # Morton implicit tree (and 2-3x for single rays); the device
        # refit path keeps using Morton trees (bvh.build).
        return [_builder(tris, leaf_size)]
    cent = (v[idx[:, 0]] + v[idx[:, 1]] + v[idx[:, 2]]) / 3.0
    lo = cent.min(axis=0)
    hi = cent.max(axis=0)
    order = np.argsort(
        _morton3((cent - lo) / np.maximum(hi - lo, 1e-12)), kind="stable"
    )
    n_chunks = -(-T // chunk_tris)
    out = []
    dists = []
    for c in range(n_chunks):
        sel = order[c * chunk_tris : (c + 1) * chunk_tris]
        sub = Triangles(
            verts=tris.verts,  # shared vertex pool
            idx=tris.idx[sel],
            uv=tris.uv,
            material_id=tris.material_id[sel],
        )
        bvh = _builder(sub, leaf_size)
        # Remap local tri ids (positions in `sel`) to global tri ids.
        tid = np.asarray(bvh.tri_id)
        glob = np.where(tid >= 0, sel[np.clip(tid, 0, len(sel) - 1)], -1)
        out.append(bvh.replace(tri_id=jnp.asarray(glob, jnp.int32)))
        if order_from is not None:
            lo = cent[sel].min(axis=0)
            hi = cent[sel].max(axis=0)
            # Distance from the viewpoint to the chunk's centroid AABB
            # (0 inside it) — near-to-far sort key.
            p = np.asarray(order_from, np.float32).reshape(3)
            dists.append(float(np.linalg.norm(np.maximum(
                np.maximum(lo - p, p - hi), 0.0))))
    if order_from is not None:
        out = [out[i] for i in np.argsort(np.asarray(dists), kind="stable")]
    return out


def build_chunked_packed(tris, leaf_size: int = 16, chunk_tris: int = CHUNK_TRIS):
    """Chunked lane-slot BVHPacked list for the binary packet kernels."""
    return [
        pack_bvh_planes(b) for b in _chunked_sah_trees(tris, leaf_size, chunk_tris)
    ]


def build_chunked_wide(tris, leaf_size: int = 4, chunk_tris: int = CHUNK_TRIS,
                       wide_leaf: int = 32, split_free: bool = False,
                       block_reads: bool = False, uniform: bool = True,
                       quant: bool = False, row_tables: bool = True,
                       order_from=None, spatial: bool = False):
    """Chunked WideBVH list for the 8-wide SMEM-node kernel (bvh.wide).

    leaf_size is the BINARY SAH leaf (small = best tree quality); wide_leaf
    is the traversal leaf granularity chosen at collapse time (adaptive
    subtree leafing — see bvh.wide.build_wide).

    uniform=True pads every chunk to identical static shapes
    (n_wide/trow/max_stack maxima) so ONE compiled kernel serves all
    chunks: without it a C-chunk scene costs C Mosaic compiles per
    traversal variant (~25s each on the axon remote-compile path) and C
    jit cache entries. Padding is dead weight only — appended nodes/rows
    are unreachable (no parent slot references them; the per-chunk root
    stays at node 0)."""
    from blink.bvh.wide import build_wide

    chunks = [
        build_wide(b, wide_leaf=wide_leaf, split_free=split_free,
                   block_reads=block_reads, quant=quant,
                   row_tables=row_tables)
        for b in _chunked_sah_trees(tris, leaf_size, chunk_tris,
                                    order_from=order_from, spatial=spatial)
    ]
    if uniform and len(chunks) > 1:
        chunks = pad_chunks_uniform(chunks)
    return chunks


def _default_leaf_mode(wide, any_hit: bool = False) -> str:
    """Production leaf mode, resolved to MEASURED constants.

    'group' everywhere: three on-chip A/B points close the finer-gating
    family on THIS chip (docs/PERF_NOTES.md round-5 — row@250k/32 r3
    wash, row@150k/44 1.2x worse, stream@340k/44 1.18x worse, all exact
    parity; the r3 any-hit row win evaporated at the wl44 tree shape).
    The dispatch is EMULATOR-CALIBRATED (axon v5e, 2026-08-21): real
    silicon may weigh the scalar-vector balance differently, so
    BLINK_LEAF_MODE={group,row,stream} exists as a measurement escape
    hatch (VERDICT r4 weak #6) — it changes performance only, never
    results (parity-tested), and row/stream require a WideBVH built
    with row_tables (silently falls back to 'group' otherwise)."""
    import os

    override = os.environ.get("BLINK_LEAF_MODE", "")
    if override in ("row", "stream") and getattr(wide, "bref", None) is not None:
        return override
    if override == "group":
        return override
    del any_hit
    return "group"


def pad_chunks_uniform(chunks):
    """Pad a WideBVH list to shared static shapes (see build_chunked_wide)."""
    n_wide = max(c.n_wide for c in chunks)
    t_rows = max(c.trow.shape[0] for c in chunks)
    stack = max(c.max_stack for c in chunks)
    b_rows = max(
        (c.tbat.shape[0] for c in chunks if c.tbat is not None), default=0
    )
    out = []
    for c in chunks:
        cw = 24 if getattr(c, "quant", False) else 64  # i32/f32 words/node
        child = jnp.concatenate(
            [c.child, jnp.zeros((n_wide * cw - c.child.shape[0],),
                                c.child.dtype)]
        )
        perm = jnp.concatenate(
            [c.perm, jnp.zeros((n_wide * 8 - c.perm.shape[0],),
                               c.perm.dtype)]
        )
        trow = jnp.concatenate(
            [c.trow, jnp.zeros((t_rows - c.trow.shape[0], c.trow.shape[1]),
                               c.trow.dtype)]
        )
        kw = {}
        if c.bref is not None:
            kw["bref"] = jnp.concatenate(
                [c.bref, jnp.zeros((n_wide * 8 - c.bref.shape[0],),
                                   c.bref.dtype)]
            )
            kw["tbat"] = jnp.concatenate(
                [c.tbat, jnp.zeros((b_rows - c.tbat.shape[0],
                                    c.tbat.shape[1]), c.tbat.dtype)]
            )
        if getattr(c, "nbox", None) is not None:
            # Padding nodes are unreachable; a zero dequant frame is fine.
            kw["nbox"] = jnp.concatenate(
                [c.nbox, jnp.zeros((n_wide * 8 - c.nbox.shape[0],),
                                   c.nbox.dtype)]
            )
        out.append(c.replace(child=child, perm=perm, trow=trow,
                             n_wide=n_wide, max_stack=stack, **kw))
    return out


def traverse_closest_wide(
    o: Array, d: Array, chunks, t_min: float = T_MIN,
    interpret: bool | None = None, rows: int = RAY_ROWS,
    row_groups: int = ROW_GROUPS, leaf_mode: str = "group",
    t_far: Array | None = None,
):
    """Closest hit over a list of WideBVH chunks (multi-pass, threaded
    best t — same exact semantics as traverse_closest_chunked).

    Rays are packed to the kernel's (3, G*rows, 128) layout ONCE and the
    running best t/prim are threaded between chunks in packed form: all
    inter-chunk glue is then fusable elementwise, and the only relayout
    ops are one pack + one unpack per frame (see _traverse_wide_packed).

    `t_far` (optional, per-ray) bounds the search: hits are only reported
    strictly below it. t_far=0 lanes fail every slab test, so dead bounce
    rays in a wavefront cost one root visit instead of a full walk — and
    a cull group whose rays are ALL dead (compaction sinks dead rays to
    the tail) skips the entire tree."""
    n = o.shape[0]
    if t_far is None:
        t_far = jnp.full((n,), T_MAX, jnp.float32)
    o_t, d_t, tf_t, _ = _pack_rays(o, d, t_far, rows=rows)
    best_t = tf_t
    best_prim = jnp.full(tf_t.shape, -1, jnp.int32)
    for wide in chunks:
        t, prim = _traverse_wide_packed(
            o_t, d_t, best_t, wide, any_hit=False, t_min=t_min,
            interpret=interpret, rows=rows, row_groups=row_groups,
            leaf_mode=leaf_mode,
        )
        better = prim >= 0
        best_t = jnp.where(better, t, best_t)
        best_prim = jnp.where(better, prim, best_prim)
    return (
        jax.lax.stop_gradient(best_t.reshape(-1)[:n]),
        best_prim.reshape(-1)[:n],
    )


def traverse_anyhit_wide(
    o: Array, d: Array, chunks, t_far: Array, t_min: float = T_MIN,
    interpret: bool | None = None, rows: int = RAY_ROWS,
    leaf_mode: str = "group",
):
    """Any-hit over WideBVH chunks; packed-layout threading as in
    traverse_closest_wide (blocked rays get t_far=0 -> all slabs fail)."""
    n = o.shape[0]
    o_t, d_t, tf_t, _ = _pack_rays(o, d, t_far, rows=rows)
    blocked = jnp.zeros(tf_t.shape, bool)
    for wide in chunks:
        tf = jnp.where(blocked, 0.0, tf_t)
        _, prim = _traverse_wide_packed(
            o_t, d_t, tf, wide, any_hit=True, t_min=t_min,
            interpret=interpret, rows=rows, leaf_mode=leaf_mode,
        )
        blocked = blocked | (prim >= 0)
    return blocked.reshape(-1)[:n]


def traverse_closest_chunked(
    o: Array, d: Array, chunks, t_min: float = T_MIN,
    interpret: bool | None = None, variant: str = CLOSEST_VARIANT,
    t_far: Array | None = None,
):
    """Closest hit over a list of chunk BVHs: sequential passes threading
    the running best t as each pass's t_far (exact: each chunk's walk is
    culled by hits found in previous chunks). Chunks may be BVHPacked
    (binary lane-slot kernels, per `variant`) or WideBVH (8-wide SMEM-node
    kernel) — the production pallas backend ships wide chunks.

    Optional per-ray `t_far` bounds the search (see traverse_closest_wide:
    t_far=0 == dead-lane cull for bounce wavefronts)."""
    from blink.bvh.wide import WideBVH

    if chunks and isinstance(chunks[0], WideBVH):
        # Packed-layout threading (one relayout per frame, not per chunk).
        return traverse_closest_wide(
            o, d, chunks, t_min=t_min, interpret=interpret,
            leaf_mode=_default_leaf_mode(chunks[0]), t_far=t_far,
        )
    n = o.shape[0]
    best_t = (
        jnp.full((n,), T_MAX, jnp.float32)
        if t_far is None
        else jnp.broadcast_to(jnp.asarray(t_far, jnp.float32), (n,))
    )
    best_prim = jnp.full((n,), -1, jnp.int32)
    for packed in chunks:
        t, prim = _traverse_pallas(
            o, d, best_t, packed, any_hit=False, t_min=t_min,
            interpret=interpret, variant=variant,
        )
        better = prim >= 0
        best_t = jnp.where(better, t, best_t)
        best_prim = jnp.where(better, prim, best_prim)
    return jax.lax.stop_gradient(best_t), best_prim


def traverse_anyhit_chunked(
    o: Array, d: Array, chunks, t_far: Array, t_min: float = T_MIN,
    interpret: bool | None = None,
):
    from blink.bvh.wide import WideBVH

    if chunks and isinstance(chunks[0], WideBVH):
        return traverse_anyhit_wide(
            o, d, chunks, t_far, t_min=t_min, interpret=interpret,
            leaf_mode=_default_leaf_mode(chunks[0], any_hit=True),
        )
    blocked = jnp.zeros((o.shape[0],), bool)
    for packed in chunks:
        # Blocked rays get t_far=0: their packets' slab tests all fail.
        tf = jnp.where(blocked, 0.0, t_far)
        _, prim = _traverse_pallas(
            o, d, tf, packed, any_hit=True, t_min=t_min,
            interpret=interpret,
        )
        blocked = blocked | (prim >= 0)
    return blocked


def traverse_anyhit_pallas(
    o: Array, d: Array, bvh, t_far: Array, t_min: float = T_MIN,
    interpret: bool | None = None,
):
    """Shadow test: True where a hit exists in (t_min, t_far)."""
    packed = bvh if isinstance(bvh, BVHPacked) else pack_bvh_planes(bvh)
    _, prim = _traverse_pallas(
        o, d, t_far, packed, any_hit=True, t_min=t_min, interpret=interpret
    )
    return prim >= 0

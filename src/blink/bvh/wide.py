"""8-wide BVH collapse (host-side numpy) for the Pallas wide-packet kernel.

The binary skip-link walk pays one serial scalar-loop iteration per node:
row load -> roll -> extracts -> slab -> cross-lane any() -> cursor select,
a ~26ns dependency chain (docs/PERF_NOTES.md). Collapsing the binary SAH
tree into 8-ary nodes amortizes that chain over 8 child slab tests per
iteration — the classic wide-BVH (QBVH/MBVH) reformulation, re-derived
here for the TPU's scalar-core + VPU split: child records live in SMEM
(scalar loads, ~1 cycle, no roll dance) and the 8 slab tests are
independent vector ops that pipeline.

Collapse rule: greedy surface-area — start from a binary subtree root,
repeatedly expand the largest-surface-area internal candidate until 8
children are collected; internal children become new wide nodes. This
preserves the SAH tree's quality (it is a re-bracketing, not a rebuild).

Per-node octant tables give near-first child PUSH order for each of the 8
ray-direction octants (packet-dominant signs), packed 3 bits per slot.
Ordering is a performance hint only — traversal remains exact under any
order because every pop re-tests its box against the current best t.

Spec: SURVEY.md §2 "BVH builder (flat)" / §7.2.1 traversal plan;
BASELINE.json:5 "stackless BVH traversal ... re-derived for SIMD lanes".
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blink.bvh.build import EMPTY_BOX
from blink.bvh.types import FlatBVH
from blink.core.struct import pytree_dataclass, static_field

Array = jnp.ndarray

WIDTH = 8
#: SMEM stack capacity for the wide walk: <= 1 + 7*depth pushes; the SAH
#: builder bounds binary depth (_FORCE_BALANCE_DEPTH + log-halving), and
#: collapse divides depth by ~3. Asserted exactly at build time.
WIDE_STACK_CAP = 192


@pytree_dataclass
class WideBVH:
    """Device layout consumed by the Pallas wide kernel.

    child: (n_wide*64,) f32 — 8 fields [lx ly lz hx hy hz ref cnt] x 8
      slots per node, FLAT 1D (SMEM pads the minor dim of 2D arrays to 128
      lanes — a (N, 8) table would allocate 16x its size and blow the 1 MB
      SMEM budget; 1D is dense). cnt>0 means leaf child (tri slots
      [ref, ref+cnt)), cnt==0 & ref>0 internal child (wide node index),
      cnt==0 & ref==0 empty slot whose EMPTY_BOX can never pass a slab.
    perm: (n_wide*8,) i32 flat — per ray-direction octant, the 8 child
      slots in near-first order, 3 bits per position (LSB = nearest).
    trow: (ceil(P/12), 128) f32 lane-slot triangle records (same layout as
      traverse_pallas.BVHPacked.trow).
    """

    child: Array
    perm: Array
    trow: Array
    #: row-gated leaf-test layout (the "row" leaf mode — see
    #: traverse_pallas._make_kernel_wide): triangles of each leaf child
    #: re-packed into 8-tri BATCHES with TRIS IN SUBLANES. Batch B lives
    #: at tbat rows [8*(B//8), +8), lanes [16*(B%8), +16): per-tri lane
    #: layout [v0(3) e1(3) e2(3) gid slot] (11 of 16 used; slot = the
    #: child-local slot index, the tie-break key matching the sequential
    #: kernel's first-slot-wins). bref[(node*8 + slot)] = first batch id
    #: of that child's span (leaf children only; batches are ceil(cnt/8),
    #: tail tris padded degenerate with gid -1/zero verts).
    bref: Array = None
    tbat: Array = None
    #: quantized-child mode (quant=True): `child` is (n_wide*24,) i32 —
    #: per slot [w0, w1, w2] with w0 = qlo.x|qlo.y<<8|qlo.z<<16|cnt<<24,
    #: w1 = qhi.x|qhi.y<<8|qhi.z<<16, w2 = ref — and `nbox` is
    #: (n_wide*8,) f32 per-node dequant frames [ox oy oz sx sy sz 0 0]:
    #: coord = o + q*s, q in [0,255]. 12 B/child + 4 B/child frame vs
    #: 32 B/child f32 → ~2.1x more tree per SMEM byte, which is what
    #: lets production use smaller wide leaves (tighter packet unions)
    #: without chunk-count explosion. Quantization is CONSERVATIVE
    #: (host-side nudging in exact f32 decode arithmetic: decoded box
    #: always contains the true box), so traversal results are exact —
    #: boxes are only <= 1/255 of node extent looser per side. u8 +
    #: sitofp dequant, not bf16 pairs: Mosaic lowers scalar int->float
    #: converts but not scalar bitcasts (benchmarks/scalar_ops_probe.py,
    #: on-chip 2026-08-19).
    nbox: Array = None
    n_wide: int = static_field(default=0)
    leaf_size: int = static_field(default=4)
    max_stack: int = static_field(default=WIDE_STACK_CAP)
    quant: bool = static_field(default=False)
    #: kernel reads leaf tri records in cnt-gated blocks of 8 (vs one
    #: straight unroll of leaf_size reads). Measured on-chip (bunny 512^2):
    #: blocked reads cost ~25% — the cnt-gate conds outweigh the saved
    #: loads — so straight unroll is the default.
    block_reads: bool = static_field(default=False)


def _quantize_children(
    child: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """(n_wide, 8, 8) f32 child records -> (childq (n_wide*24,) i32,
    nbox (n_wide*8,) f32). See WideBVH.nbox for the format.

    Conservative by construction AND by verification: q is floor/ceil
    quantized, then nudged until the EXACT f32 decode (origin + q*step,
    the same arithmetic the kernel's sitofp+fma performs) brackets the
    true box on every axis. Empty slots (ref==0, cnt==0, EMPTY_BOX far
    point) encode as the far-corner point box q=255 — even if a ray
    grazes that exact corner, an empty slot triggers no push and no
    leaf test, so a spurious pass costs nothing."""
    n = child.shape[0]
    lo = child[:, :, 0:3].astype(np.float32)
    hi = child[:, :, 3:6].astype(np.float32)
    ref = child[:, :, 6].astype(np.int64)
    cnt = child[:, :, 7].astype(np.int64)
    assert int(cnt.max(initial=0)) <= 127, "cnt must fit 7 bits (sign-safe)"
    assert int(ref.max(initial=0)) < 2**31, "ref must fit i32"
    filled = ~((cnt == 0) & (ref == 0) & (lo[..., 0] >= 1e29))

    glo = np.where(filled[..., None], lo, np.inf).min(axis=1)
    ghi = np.where(filled[..., None], hi, -np.inf).max(axis=1)
    none = ~filled.any(axis=1)
    glo[none] = 0.0
    ghi[none] = 1.0
    glo = glo.astype(np.float32)
    step = ((ghi - glo) / 255.0).astype(np.float32)
    # Bump step by ulps until origin + 255*step covers ghi in exact f32.
    for _ in range(8):
        bad = (glo + np.float32(255.0) * step) < ghi
        if not bad.any():
            break
        step = np.where(
            bad, np.nextafter(step, np.float32(np.inf)), step
        ).astype(np.float32)
    assert not ((glo + np.float32(255.0) * step) < ghi).any()

    safe = np.where(step > 0, step, np.float32(1.0)).astype(np.float32)
    o3 = glo[:, None, :]
    s3 = safe[:, None, :]
    ql = np.clip(np.floor((lo - o3) / s3), 0, 255).astype(np.float32)
    qh = np.clip(np.ceil((hi - o3) / s3), 0, 255).astype(np.float32)

    def dec(q):  # EXACT kernel decode: f32 fma of f32(q) and step
        return (o3 + q * step[:, None, :]).astype(np.float32)

    for _ in range(8):
        low_bad = dec(ql) > lo
        high_bad = dec(qh) < hi
        if not (low_bad[filled].any() or high_bad[filled].any()):
            break
        ql = np.where(low_bad, np.maximum(ql - 1, 0), ql)
        qh = np.where(high_bad, np.minimum(qh + 1, 255), qh)
    assert (dec(ql)[filled] <= lo[filled]).all(), "lo not conservative"
    assert (dec(qh)[filled] >= hi[filled]).all(), "hi not conservative"

    qli = ql.astype(np.int64)
    qhi_ = qh.astype(np.int64)
    qli[~filled] = 255
    qhi_[~filled] = 255
    w0 = qli[..., 0] | (qli[..., 1] << 8) | (qli[..., 2] << 16) | (cnt << 24)
    w1 = qhi_[..., 0] | (qhi_[..., 1] << 8) | (qhi_[..., 2] << 16)
    w2 = ref
    childq = np.stack([w0, w1, w2], axis=-1).astype(np.int32)  # (n,8,3)
    nbox = np.zeros((n, 8), np.float32)
    nbox[:, 0:3] = glo
    nbox[:, 3:6] = step
    return childq.reshape(n * 24), nbox.reshape(n * 8)


def _sa(lo: np.ndarray, hi: np.ndarray) -> float:
    d = np.maximum(hi - lo, 0.0)
    return float(d[0] * d[1] + d[1] * d[2] + d[0] * d[2])


def build_wide(bvh: FlatBVH, wide_leaf: int = 32, split_free: bool = False,
               block_reads: bool = False, quant: bool = False,
               row_tables: bool = True) -> WideBVH:
    """Collapse a binary preorder skip-link FlatBVH into a WideBVH.

    Adaptive subtree leafing: the SAH builder assigns leaf triangle slots
    in tight consecutive preorder blocks (bvh.sah), so ANY subtree owns the
    contiguous slot span [csum[i], csum[skip[i]]). The collapse exploits
    this: a child subtree with <= wide_leaf total triangles becomes a leaf
    child spanning its whole subtree, regardless of the binary tree's own
    leaf size. Build the binary tree with a SMALL leaf (max tree quality);
    pick the traversal leaf granularity here. This also fixes the naive
    collapse's ~35% child-slot fill (bottom-level binary internals used to
    become 2-child wide nodes; now they fold into their parent as leaves).
    """
    lo = np.asarray(bvh.lo, np.float32)
    hi = np.asarray(bvh.hi, np.float32)
    skip = np.asarray(bvh.skip, np.int64)
    count = np.asarray(bvh.count, np.int64)
    n = skip.shape[0]
    node_ids = np.arange(n)
    is_internal = (count == 0) & (skip > node_ids + 1)
    assert int(count.max(initial=0)) <= wide_leaf, (
        "binary leaf_size must be <= wide_leaf"
    )

    # Subtree slot spans: csum[i] = total leaf-slot count before preorder i.
    csum = np.zeros(n + 1, np.int64)
    csum[1:] = np.cumsum(count)
    sub_first = csum[node_ids]  # subtree slot base (tight preorder packing)
    sub_count = csum[skip] - csum[node_ids]  # total tris in subtree
    first = np.asarray(bvh.first, np.int64)
    leaf_ids = node_ids[count > 0]
    assert np.array_equal(first[leaf_ids], csum[leaf_ids]), (
        "build_wide requires tight preorder leaf-slot packing (SAH trees); "
        "padded-block producers (Morton build_flat_bvh) are not supported"
    )

    def is_leafable(k: int) -> bool:
        return sub_count[k] <= wide_leaf

    # --- greedy SA collapse with adaptive leafing ------------------------
    kids_of: list[list[int]] = []  # wide id -> binary child ids
    wide_ref: list[list[int]] = []  # parallel: ref per kid (wide id if int.)
    queue: list[tuple[int, int]] = [(0, 0)]  # (binary root, wide id)
    next_wide = 1
    qi = 0
    while qi < len(queue):
        b, wid = queue[qi]
        qi += 1
        kids = [b]
        while len(kids) < WIDTH:
            # Two-tier greedy: MUST-split kids (bigger than a wide leaf)
            # first, largest surface area first; then, with slots left
            # over, split leafable internals too — all 8 slots get slab
            # tests anyway (empty slots are EMPTY_BOX), so finer children
            # in free slots are free culling.
            best, best_sa, best_must = -1, -1.0, False
            for i, k in enumerate(kids):
                if not is_internal[k]:
                    continue
                must = not is_leafable(k)
                if not must and not split_free:
                    continue  # leafable kids terminal (coarser leaves)
                s = _sa(lo[k], hi[k])
                if (must, s) > (best_must, best_sa):
                    best, best_sa, best_must = i, s, must
            if best < 0:
                break
            k = kids.pop(best)
            kids.extend((k + 1, int(skip[k + 1])))
        refs = []
        for k in kids:
            if is_internal[k] and not is_leafable(k):
                refs.append(next_wide)
                queue.append((k, next_wide))
                next_wide += 1
            else:
                refs.append(-1)  # leaf child: whole-subtree slot span
        while len(kids_of) <= wid:
            kids_of.append([])
            wide_ref.append([])
        kids_of[wid] = kids
        wide_ref[wid] = refs
    n_wide = next_wide

    # --- emit child records ----------------------------------------------
    child = np.zeros((n_wide, WIDTH, 8), np.float32)
    child[:, :, 0:3] = EMPTY_BOX
    child[:, :, 3:6] = EMPTY_BOX
    centers = np.zeros((n_wide, WIDTH, 3), np.float32)
    filled = np.zeros((n_wide, WIDTH), bool)
    for wid in range(n_wide):
        for s, (k, r) in enumerate(zip(kids_of[wid], wide_ref[wid])):
            child[wid, s, 0:3] = lo[k]
            child[wid, s, 3:6] = hi[k]
            if r >= 0:
                child[wid, s, 6] = float(r)
                child[wid, s, 7] = 0.0
            else:
                child[wid, s, 6] = float(sub_first[k])
                child[wid, s, 7] = float(sub_count[k])
            centers[wid, s] = 0.5 * (lo[k] + hi[k])
            filled[wid, s] = True

    # --- per-octant near-first push orders (vectorized) -------------------
    oct_bits = np.arange(8)
    signs = np.stack(
        [
            np.where(oct_bits & 1, 1.0, -1.0),
            np.where(oct_bits & 2, 1.0, -1.0),
            np.where(oct_bits & 4, 1.0, -1.0),
        ],
        axis=1,
    ).astype(np.float32)  # (8 octants, 3)
    keys = np.einsum("wsc,oc->wos", centers, signs)  # (n_wide, 8oct, 8slot)
    keys = np.where(filled[:, None, :], keys, np.inf)  # empties last
    order = np.argsort(keys, axis=2, kind="stable")  # near-first slots
    shifts = (3 * np.arange(WIDTH))[None, None, :]
    perm = (order << shifts).sum(axis=2).astype(np.int32)  # (n_wide, 8)

    # --- exact worst-case stack depth --------------------------------------
    # stack(w) = max over children c at position i (by any order) ... a safe
    # exact-enough bound: along any root->node path each visit nets <= 7
    # additional entries; use wide-tree depth.
    depth = np.zeros(n_wide, np.int64)
    for wid in range(n_wide):  # parents precede children (BFS ids)
        for r in wide_ref[wid]:
            if r >= 0:
                depth[r] = depth[wid] + 1
    max_stack = int(1 + 7 * (depth.max() + 1)) if n_wide else 1
    if max_stack > WIDE_STACK_CAP:
        raise ValueError(
            f"wide BVH depth {int(depth.max())} needs stack {max_stack} > "
            f"{WIDE_STACK_CAP}"
        )

    # --- triangle lane-slot rows (shared layout with BVHPacked.trow) ------
    # The kernel unrolls wide_leaf reads per leaf visit (masked j < cnt),
    # so slots must extend wide_leaf-1 past the last real slot. The source
    # FlatBVH arrays are padded for the BINARY leaf size only; re-pad here.
    from blink.kernels.traverse_pallas import LANES, TRI_LANES, TRIS_PER_ROW

    need = int(csum[-1]) + wide_leaf - 1
    p = bvh.tri_id.shape[0]
    prows = -(-max(p, need) // TRIS_PER_ROW)
    trec = np.concatenate(
        [
            np.asarray(bvh.tv0, np.float32),
            np.asarray(bvh.te1, np.float32),
            np.asarray(bvh.te2, np.float32),
            np.asarray(bvh.tri_id, np.float32)[:, None],
        ],
        axis=1,
    )
    pad_p = prows * TRIS_PER_ROW - p
    pad_t = np.concatenate(
        [np.zeros((1, 9), np.float32), np.full((1, 1), -1.0, np.float32)],
        axis=1,
    )
    trec = np.concatenate([trec, np.tile(pad_t, (pad_p, 1))])
    trec = trec.reshape(prows, TRIS_PER_ROW * TRI_LANES)
    trow = np.concatenate(
        [trec, np.zeros((prows, LANES - TRIS_PER_ROW * TRI_LANES), np.float32)],
        axis=1,
    )

    # --- row-gated batch table (tris in sublanes; see WideBVH.tbat) -------
    # row_tables=False skips them: tbat costs ~64 B/tri plus batch padding
    # in VMEM — at production chunk sizes that is several MB per chunk the
    # group-mode kernels never read.
    if not row_tables:
        kw = {}
        if quant:
            childq, nbox = _quantize_children(child)
            kw = {"child": jnp.asarray(childq), "nbox": jnp.asarray(nbox)}
        else:
            kw = {"child": jnp.asarray(child.reshape(n_wide * WIDTH * 8))}
        return WideBVH(
            perm=jnp.asarray(perm.reshape(n_wide * WIDTH)),
            trow=jnp.asarray(trow),
            n_wide=n_wide,
            leaf_size=wide_leaf,
            max_stack=max_stack,
            block_reads=block_reads,
            quant=quant,
            **kw,
        )
    tv0 = np.asarray(bvh.tv0, np.float32)
    te1 = np.asarray(bvh.te1, np.float32)
    te2 = np.asarray(bvh.te2, np.float32)
    tid = np.asarray(bvh.tri_id, np.float32)
    bref = np.zeros((n_wide, WIDTH), np.int32)
    tiles: list[np.ndarray] = []
    for wid in range(n_wide):
        for s, (k, r) in enumerate(zip(kids_of[wid], wide_ref[wid])):
            if r >= 0:
                continue  # internal child
            f, c = int(sub_first[k]), int(sub_count[k])
            if c <= 0:
                continue
            bref[wid, s] = len(tiles)
            for b0 in range(0, c, 8):
                tile = np.zeros((8, 16), np.float32)
                tile[:, 9] = -1.0  # batch-tail pad: gid -1, zero verts
                m = min(8, c - b0)
                sl = slice(f + b0, f + b0 + m)
                tile[:m, 0:3] = tv0[sl]
                tile[:m, 3:6] = te1[sl]
                tile[:m, 6:9] = te2[sl]
                tile[:m, 9] = tid[sl]
                tile[:m, 10] = np.arange(b0, b0 + m, dtype=np.float32)
                tiles.append(tile)
    nb = max(len(tiles), 1)
    # +8 pad rows: the stream leaf mode DMAs a fixed (16,128) window
    # starting at the leaf's first batch block; a leaf whose batches sit
    # in the last block must not read past the table.
    brows = -(-nb // 8) * 8 + 8
    tbat = np.zeros((brows, 128), np.float32)
    for B, tile in enumerate(tiles):
        tbat[8 * (B // 8) : 8 * (B // 8) + 8,
             16 * (B % 8) : 16 * (B % 8) + 16] = tile

    if quant:
        childq, nbox = _quantize_children(child)
        ckw = {"child": jnp.asarray(childq), "nbox": jnp.asarray(nbox)}
    else:
        ckw = {"child": jnp.asarray(child.reshape(n_wide * WIDTH * 8))}
    return WideBVH(
        perm=jnp.asarray(perm.reshape(n_wide * WIDTH)),
        trow=jnp.asarray(trow),
        bref=jnp.asarray(bref.reshape(n_wide * WIDTH)),
        tbat=jnp.asarray(tbat),
        n_wide=n_wide,
        leaf_size=wide_leaf,
        max_stack=max_stack,
        block_reads=block_reads,
        quant=quant,
        **ckw,
    )

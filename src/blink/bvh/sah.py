"""Binned-SAH BVH builder (host-side numpy, level-synchronous vectorized).

The Morton implicit tree (bvh.build) splits at fixed equal-count dyadic
boundaries; surface-area-heuristic splits adapt to geometry (big floor/wall
triangles vs dense small-triangle clusters — the Sponza-class mix) and cut
node/leaf visits during traversal. Output is the same FlatBVH preorder
skip-link layout, so every traversal backend (pure-JAX, Pallas skip-walk,
Pallas ordered stack-walk) consumes it unchanged. heap2pre is None: the
device-side refit (Morton trees only) does not apply; rebuild on geometry
change.

Algorithm (no Python-per-node loops until the final flatten):
  level-synchronously, for all active segments (contiguous prim ranges):
    1. per-segment centroid bounds -> widest axis (vectorized scatter
       reductions keyed by segment id);
    2. NBINS bins along that axis; per-(segment, bin) counts and box
       bounds via np.minimum.at / np.bincount on fused keys;
    3. SAH sweep over bins (prefix/suffix sums) -> best split per segment;
       a segment becomes a leaf if count <= leaf_size or no split beats
       the leaf cost;
    4. partition prims with one stable np.lexsort on (segment, side).
  The final preorder flatten walks the recorded binary structure once
  (~2T/leaf_size nodes, trivially fast).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from blink.bvh.build import EMPTY_BOX
from blink.bvh.types import FlatBVH
from blink.scene.scene import Triangles

NBINS = 16
_TRAV_COST = 1.0
_ISECT_COST = 1.0
#: Depth at which splitting switches from SAH to balanced positional
#: halves. SAH/fallback splits can peel tiny segments repeatedly on skewed
#: geometry, so depth alone does not bound; forced halving past this depth
#: adds at most ceil(log2(count/leaf_size)) more levels, keeping the total
#: depth < traverse_pallas.STACK_CAP (asserted there at pack time).
_FORCE_BALANCE_DEPTH = 40


def _sa(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    d = np.maximum(hi - lo, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 0] * d[..., 2]


def build_sah_bvh(tris: Triangles, leaf_size: int = 16) -> FlatBVH:
    v = np.asarray(tris.verts, np.float32)
    idx = np.asarray(tris.idx, np.int64)
    T = idx.shape[0]
    K = leaf_size
    if T == 0:
        from blink.bvh.build import build_flat_bvh

        return build_flat_bvh(tris, leaf_size)

    p0, p1, p2 = v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]
    tlo = np.minimum(np.minimum(p0, p1), p2).astype(np.float64)
    thi = np.maximum(np.maximum(p0, p1), p2).astype(np.float64)
    cent = 0.5 * (tlo + thi)

    order = np.arange(T)
    seg_of = np.zeros(T, np.int64)  # segment id per prim position
    # Segment registry (grows as splits happen). A segment is a node-to-be.
    seg_start = [0]
    seg_end = [T]
    seg_parent = [-1]
    seg_is_right = [False]
    seg_leaf = [False]
    seg_depth = [0]
    active = [0]

    while active:
        n_act = len(active)
        act = np.array(active)
        # Map prim -> local active index (-1 inactive).
        local_of_seg = -np.ones(len(seg_start), np.int64)
        local_of_seg[act] = np.arange(n_act)
        loc = local_of_seg[seg_of]  # (T,) local segment index or -1
        sel = loc >= 0
        locs = loc[sel]
        c = cent[order[sel]]
        lo_p = tlo[order[sel]]
        hi_p = thi[order[sel]]

        # 1. centroid bounds per active segment.
        cb_lo = np.full((n_act, 3), np.inf)
        cb_hi = np.full((n_act, 3), -np.inf)
        np.minimum.at(cb_lo, locs, c)
        np.maximum.at(cb_hi, locs, c)
        ext = cb_hi - cb_lo
        axis = np.argmax(ext, axis=1)
        width = ext[np.arange(n_act), axis]
        degenerate = width <= 1e-12

        # 2. bin prims.
        cax = c[np.arange(c.shape[0]), axis[locs]]
        t0 = cb_lo[locs, axis[locs]]
        w = np.maximum(width[locs], 1e-12)
        b = np.minimum(((cax - t0) / w * NBINS).astype(np.int64), NBINS - 1)
        key = locs * NBINS + b
        counts = np.bincount(key, minlength=n_act * NBINS).reshape(n_act, NBINS)
        bin_lo = np.full((n_act * NBINS, 3), np.inf)
        bin_hi = np.full((n_act * NBINS, 3), -np.inf)
        np.minimum.at(bin_lo, key, lo_p)
        np.maximum.at(bin_hi, key, hi_p)
        bin_lo = bin_lo.reshape(n_act, NBINS, 3)
        bin_hi = bin_hi.reshape(n_act, NBINS, 3)

        # 3. SAH sweep: prefix (left) and suffix (right) boxes/counts.
        pre_lo = np.minimum.accumulate(bin_lo, axis=1)
        pre_hi = np.maximum.accumulate(bin_hi, axis=1)
        suf_lo = np.minimum.accumulate(bin_lo[:, ::-1], axis=1)[:, ::-1]
        suf_hi = np.maximum.accumulate(bin_hi[:, ::-1], axis=1)[:, ::-1]
        pre_n = np.cumsum(counts, axis=1)
        total_n = pre_n[:, -1]
        suf_n = total_n[:, None] - pre_n
        # Split after bin s (s = 0..NBINS-2): left = bins<=s, right = rest.
        sa_l = _sa(pre_lo[:, :-1], pre_hi[:, :-1])
        sa_r = _sa(suf_lo[:, 1:], suf_hi[:, 1:])
        nl = pre_n[:, :-1]
        nr = suf_n[:, :-1]
        cost = sa_l * nl + sa_r * nr
        cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
        best_s = np.argmin(cost, axis=1)
        best_cost = cost[np.arange(n_act), best_s]
        # The kernels unroll exactly leaf_size triangle tests, so a leaf
        # MUST have count <= K: segments above K always split — via SAH
        # when it found a proper cut, else by positional halves (degenerate
        # centroid spread / all prims in one bin).
        make_leaf = total_n <= K
        sah_ok = ~degenerate & np.isfinite(best_cost)

        # 4. partition non-leaf segments.
        splittable = ~make_leaf
        go_right = (b > best_s[locs]) & sah_ok[locs]
        # Positional-half fallback for unsplittable-by-SAH segments, and a
        # forced balanced split past _FORCE_BALANCE_DEPTH to bound depth.
        too_deep = np.array([seg_depth[s] for s in act]) >= _FORCE_BALANCE_DEPTH
        need_fb = splittable & (~sah_ok | too_deep)
        if need_fb.any():
            pos_in_seg = np.zeros(c.shape[0], np.int64)
            seg_starts_local = np.zeros(n_act, np.int64)
            seg_starts_local[:] = np.array([seg_start[s] for s in act])
            pos_in_seg = np.nonzero(sel)[0] - seg_starts_local[locs]
            half = (total_n[locs] + 1) // 2
            fb_right = pos_in_seg >= half
            go_right = np.where(need_fb[locs], fb_right, go_right)
        go_right &= splittable[locs]
        # stable sort prims of active segments by (segment, side).
        sub = np.lexsort((go_right, locs))
        sel_idx = np.nonzero(sel)[0]
        order[sel_idx] = order[sel_idx[sub]]
        gr_sorted = go_right[sub]
        locs_sorted = locs[sub]

        # Register children, reassign seg_of for split segments.
        new_active = []
        n_left = np.zeros(n_act, np.int64)
        np.add.at(n_left, locs_sorted, ~gr_sorted)
        new_seg_of = seg_of[sel_idx[sub]].copy()
        for a in range(n_act):
            s = act[a]
            if make_leaf[a]:
                seg_leaf[s] = True
                continue
            lchild = len(seg_start)
            rchild = lchild + 1
            st = seg_start[s]
            mid = st + int(n_left[a])
            en = seg_end[s]
            seg_start += [st, mid]
            seg_end += [mid, en]
            seg_parent += [s, s]
            seg_is_right += [False, True]
            seg_leaf += [False, False]
            seg_depth += [seg_depth[s] + 1, seg_depth[s] + 1]
            new_active += [lchild, rchild]
        # Reassign seg_of for split segments: positions [st, mid) -> left
        # child, [mid, en) -> right child (contiguous layout).
        seg_of_new = seg_of.copy()
        child_iter = iter(new_active)
        for a in range(n_act):
            if make_leaf[a]:
                continue
            lchild = next(child_iter)
            rchild = next(child_iter)
            st, en = seg_start[lchild], seg_end[lchild]
            seg_of_new[st:en] = lchild
            st, en = seg_start[rchild], seg_end[rchild]
            seg_of_new[st:en] = rchild
        seg_of = seg_of_new
        active = new_active

    # ---- flatten to preorder (single Python DFS over ~2T/K nodes) ----
    n_segs = len(seg_start)
    children = [[] for _ in range(n_segs)]
    for s in range(1, n_segs):
        children[seg_parent[s]].append(s)
    # Node bounds from prim boxes (exact).
    pre_nodes = []
    stack = [0]
    seg_pre = np.full(n_segs, -1, np.int64)
    while stack:
        s = stack.pop()
        seg_pre[s] = len(pre_nodes)
        pre_nodes.append(s)
        if not seg_leaf[s]:
            l, r = children[s]
            stack.append(r)  # preorder: left first
            stack.append(l)
    n_nodes = len(pre_nodes)
    lo_n = np.empty((n_nodes, 3), np.float32)
    hi_n = np.empty((n_nodes, 3), np.float32)
    skip = np.empty(n_nodes, np.int64)
    first = np.zeros(n_nodes, np.int64)
    count = np.zeros(n_nodes, np.int64)

    # Leaf prim slots: leaves in preorder order get consecutive tight
    # blocks of `cnt` slots each. NOTE: the kernels unroll exactly
    # leaf_size reads at first..first+leaf_size-1 (masked by j<cnt), so
    # the slot arrays are padded with leaf_size-1 trailing degenerate
    # slots below — without them the last leaf's masked tail reads would
    # be out of bounds on-chip (interpret mode clamps, Mosaic does not).
    # Compute subtree extent to fill skip: postorder via reversed preorder.
    # skip[p] = p + subtree_size(p).
    sub_sz = np.ones(n_nodes, np.int64)
    for p in range(n_nodes - 1, -1, -1):
        s = pre_nodes[p]
        if not seg_leaf[s]:
            l, r = children[s]
            sub_sz[p] = 1 + sub_sz[seg_pre[l]] + sub_sz[seg_pre[r]]
    skip = np.arange(n_nodes) + sub_sz

    # Per-segment prim-box bounds (vectorized): reduce prim boxes into the
    # deepest segment, then accumulate up via reversed preorder.
    lo_seg = np.full((n_segs, 3), np.inf)
    hi_seg = np.full((n_segs, 3), -np.inf)
    np.minimum.at(lo_seg, seg_of, tlo[order])
    np.maximum.at(hi_seg, seg_of, thi[order])
    for p in range(n_nodes - 1, -1, -1):
        s = pre_nodes[p]
        if not seg_leaf[s]:
            l, r = children[s]
            lo_seg[s] = np.minimum(lo_seg[l], lo_seg[r])
            hi_seg[s] = np.maximum(hi_seg[l], hi_seg[r])
    lo_n[:] = lo_seg[pre_nodes]
    hi_n[:] = hi_seg[pre_nodes]
    bad = ~np.isfinite(lo_n).all(axis=1) | ~np.isfinite(hi_n).all(axis=1)
    lo_n[bad] = EMPTY_BOX
    hi_n[bad] = EMPTY_BOX

    # Prim slots: walk leaves in preorder, assign padded K-blocks.
    leaf_pre = [p for p in range(n_nodes) if seg_leaf[pre_nodes[p]]]
    slots = 0
    slot_of_leaf = {}
    for p in leaf_pre:
        s = pre_nodes[p]
        cnt = seg_end[s] - seg_start[s]
        first[p] = slots
        count[p] = cnt
        slot_of_leaf[s] = slots
        slots += cnt  # tight packing: cnt slots (+ global tail pad below)
    P = max(slots + K - 1, 1)  # tail pad: masked reads past the last leaf
    tv0 = np.zeros((P, 3), np.float32)
    te1 = np.zeros((P, 3), np.float32)
    te2 = np.zeros((P, 3), np.float32)
    tri_id = np.full(P, -1, np.int64)
    sp0, sp1, sp2 = p0[order], p1[order], p2[order]
    # order is grouped by leaf segment contiguously; map each leaf's range.
    for p in leaf_pre:
        s = pre_nodes[p]
        st, en = seg_start[s], seg_end[s]
        base = slot_of_leaf[s]
        tv0[base : base + en - st] = sp0[st:en]
        te1[base : base + en - st] = sp1[st:en] - sp0[st:en]
        te2[base : base + en - st] = sp2[st:en] - sp0[st:en]
        tri_id[base : base + en - st] = order[st:en]

    return FlatBVH(
        lo=jnp.asarray(lo_n),
        hi=jnp.asarray(hi_n),
        skip=jnp.asarray(skip, jnp.int32),
        first=jnp.asarray(first, jnp.int32),
        count=jnp.asarray(count, jnp.int32),
        tv0=jnp.asarray(tv0),
        te1=jnp.asarray(te1),
        te2=jnp.asarray(te2),
        tri_id=jnp.asarray(tri_id, jnp.int32),
        heap2pre=None,
        leaf_size=K,
    )

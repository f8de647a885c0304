"""Host-side leaf-gating economics at PRODUCTION constants (round-5).

For the production chunked wide BVH (340k/wl44, camera-ordered chunks) and
the production packet/tile order, count per leaf visit:

  - active 1024-ray cull groups (group mode pays wide_leaf MT vec-ops per
    active group: full unroll, j<cnt masked),
  - needing 128-ray rows (row mode pays ceil(cnt/8) MT vec-ops per
    needing row via 8-tris-in-sublanes batches),

and report both totals in (8,128)-vec-MT-op units — the apples-to-apples
cost model of traverse_pallas._leaf_group vs _leaf_row — plus the
rows-per-active-group histogram that decides whether finer gating can pay
at all (if most rows of an active group need the leaf, row mode's 8x finer
gating buys nothing, which is what the round-3 A/B measured at 250k/32).

Approximations: best_t never tightens (static t_far) and chunk passes
don't thread best_t — an OVERCOUNT for both modes, same direction.

Run (CPU): python benchmarks/union_sim2.py [tris] [size] [chunk_tris] [wl] [spatial]
"""
from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.config import get_config
    from blink.kernels.traverse_pallas import build_chunked_wide
    from blink.render.api import _tile_shape, tile_pixel_ids
    from blink.render.camera import generate_rays

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk_tris = int(sys.argv[3]) if len(sys.argv) > 3 else 340_000
    wl = int(sys.argv[4]) if len(sys.argv) > 4 else 44
    spatial = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    cfg = get_config("sponza").override(
        width=size, height=size, sponza_tris=tris,
    )
    scene = build_scene(cfg)
    cam_o = np.asarray(scene.camera.origin, np.float32)
    chunks = build_chunked_wide(
        scene.triangles, chunk_tris=chunk_tris, wide_leaf=wl, quant=False,
        row_tables=False, order_from=cam_o, spatial=spatial,
    )
    th, tw = _tile_shape(size, size)
    pid = tile_pixel_ids(size, size, th, tw)
    o, d, _ = generate_rays(
        scene.camera, size, size, jax.random.key(0), 0, False, pixel_id=pid
    )
    o = np.asarray(o)
    d = np.asarray(d)
    inv = 1.0 / d
    n = o.shape[0]
    PACKET = 4096  # 32 rows x 128 lanes
    GROUP_ROWS = 8  # rows per cull group (one vreg of sublanes)

    tot = {
        "visits": 0,          # leaf visits (>=1 needing ray)
        "grp_ops": 0,         # group mode: active_groups * wl
        "row_ops": 0,         # row mode: needing_rows * ceil(cnt/8)
        "grp_reads": 0,       # group mode read_tri rolls: wl per visit
        "row_visits_rows": 0, # total needing rows (compaction loop work)
        "cnt_sum": 0,
    }
    rows_hist = np.zeros(33, np.int64)      # needing rows per visit
    rpg_hist = np.zeros(9, np.int64)        # needing rows per ACTIVE group

    def walk_packet(child, p0, best_t):
        ro = o[p0 : p0 + PACKET]
        ri = inv[p0 : p0 + PACKET]
        c = child.reshape(-1, 8, 8)
        stack = [0]
        while stack:
            node = stack.pop()
            rec = c[node]
            lo = rec[:, 0:3]
            hi = rec[:, 3:6]
            ref = rec[:, 6].astype(np.int64)
            cnt = rec[:, 7].astype(np.int64)
            t0 = (lo[None, :, :] - ro[:, None, :]) * ri[:, None, :]
            t1 = (hi[None, :, :] - ro[:, None, :]) * ri[:, None, :]
            tn = np.minimum(t0, t1).max(axis=2)
            tf = np.maximum(t0, t1).min(axis=2)
            need = (tn <= np.minimum(tf, best_t[:, None])) & (tf > 0)
            any_need = need.any(axis=0)
            for k in range(8):
                if not any_need[k]:
                    continue
                if cnt[k] > 0:
                    nk = need[:, k].reshape(32, 128)
                    rowneed = nk.any(axis=1)           # (32,)
                    gneed = rowneed.reshape(4, GROUP_ROWS)
                    act_g = int(gneed.any(axis=1).sum())
                    nrows = int(rowneed.sum())
                    nb = -(-int(cnt[k]) // 8)
                    tot["visits"] += 1
                    tot["grp_ops"] += act_g * wl
                    tot["row_ops"] += nrows * nb
                    tot["grp_reads"] += wl
                    tot["row_visits_rows"] += nrows
                    tot["cnt_sum"] += int(cnt[k])
                    rows_hist[nrows] += 1
                    for gr in gneed:
                        s = int(gr.sum())
                        if s:
                            rpg_hist[s] += 1
                elif ref[k] > 0:
                    stack.append(int(ref[k]))

    best = np.full((PACKET,), 1e30, np.float32)
    all_packets = n // PACKET
    stride = max(1, all_packets // 32)  # ~32 packets across the frame
    pids = list(range(0, all_packets, stride))
    for c in chunks:
        ch = np.asarray(c.child)
        for p in pids:
            walk_packet(ch, p * PACKET, best)

    rays = len(pids) * PACKET
    v = tot["visits"]
    print(f"tris={scene.n_triangles} chunks={len(chunks)} "
          f"chunk_tris={chunk_tris} wl={wl} spatial={spatial} "
          f"image={size} packets_sampled={len(pids)}")
    print(f"leaf visits: {v}  avg cnt {tot['cnt_sum']/max(v,1):.1f}  "
          f"avg needing rows/visit {tot['row_visits_rows']/max(v,1):.2f}")
    print(f"group mode: {tot['grp_ops']} MT vec-ops "
          f"(+{tot['grp_reads']} read-rolls) "
          f"= {tot['grp_ops']*1024/rays:.0f} delivered tests/ray")
    print(f"row mode:   {tot['row_ops']} MT vec-ops "
          f"= {tot['row_ops']*1024/rays:.0f} delivered tests/ray")
    print(f"row/group vec-op ratio: {tot['row_ops']/max(tot['grp_ops'],1):.3f}")
    nz = rows_hist.nonzero()[0]
    print("needing-rows/visit histogram:",
          {int(i): int(rows_hist[i]) for i in nz})
    print("needing-rows per ACTIVE group histogram:",
          {int(i): int(rpg_hist[i]) for i in rpg_hist.nonzero()[0]})


if __name__ == "__main__":
    main()

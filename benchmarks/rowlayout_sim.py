"""Row-granularity leaf-union economics vs pixel->row layout (host sim).

leaf_mode='row' gates leaf tests per 128-ray packet row. Under the
current tile order a row is a 4x32 scanline BAND of the 32x32 cull-group
block; a SQUARE-ish 8x16 sub-block gives the same 128 rays a tighter
frustum, shrinking each row's needed-leaf union at ZERO kernel cost
(pure index math in tile_pixel_ids). This sim counts delivered leaf
tests/ray at 128-ray granularity for both layouts on the production
chunked wide BVH.

Run (CPU, ~2 min at 200k tris): python benchmarks/rowlayout_sim.py [tris] [size]
"""
from __future__ import annotations

import sys

import numpy as np


def pid_current(size: int, th: int, tw: int):
    import jax.numpy as jnp  # noqa: F401

    from blink.render.api import tile_pixel_ids

    return np.asarray(tile_pixel_ids(size, size, th, tw))


def pid_rowblocks(size: int, th: int, tw: int, bh=8, bw=16):
    """Tile order with a third level: inside each 32x32 cull-group block,
    each 128-ray row is a bh x bw pixel sub-block (raster over 4x2
    sub-blocks keeps the 1024-ray group a square 32x32)."""
    h = w = size
    q = np.arange(h * w, dtype=np.int64)
    per_tile = th * tw
    tile = q // per_tile
    within = q % per_tile
    ntc = w // tw
    r0 = (tile // ntc) * th
    c0 = (tile % ntc) * tw
    # group blocks (32x32 = 1024 rays), raster inside the tile
    gside = 32
    nbc = tw // gside
    g = within // (gside * gside)
    wg = within % (gside * gside)
    gr = r0 + (g // nbc) * gside
    gc = c0 + (g % nbc) * gside
    # row sub-blocks (bh x bw = 128 rays) inside the group block
    nsc = gside // bw
    s = wg // (bh * bw)
    ws = wg % (bh * bw)
    sr = gr + (s // nsc) * bh
    sc = gc + (s % nsc) * bw
    r = sr + ws // bw
    c = sc + ws % bw
    return r * w + c


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "src")
    from blink.api import build_scene
    from blink.bvh.wide import build_wide
    from blink.config import get_config
    from blink.kernels.traverse_pallas import CHUNK_TRIS, _chunked_sah_trees
    from blink.render.api import _tile_shape
    from blink.render.camera import generate_rays

    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = get_config("sponza").override(width=size, height=size,
                                        sponza_tris=tris)
    scene = build_scene(cfg)
    chunks = [
        build_wide(b)
        for b in _chunked_sah_trees(scene.triangles, 4, CHUNK_TRIS)
    ]
    th, tw = _tile_shape(size, size)

    def delivered_for(pid, group=128):
        o, d, _ = generate_rays(
            scene.camera, size, size, jax.random.key(0), 0, False,
            pixel_id=np.asarray(pid, np.uint32),
        )
        o = np.asarray(o)
        inv = 1.0 / np.asarray(d)
        n = o.shape[0]
        all_groups = n // group
        stride = max(1, all_groups // 96)
        gids = list(range(0, all_groups, stride))
        total = 0
        for c in chunks:
            ch = np.asarray(c.child).reshape(-1, 8, 8)
            for g in gids:
                ro = o[g * group:(g + 1) * group]
                ri = inv[g * group:(g + 1) * group]
                stack = [0]
                while stack:
                    rec = ch[stack.pop()]
                    lo, hi = rec[:, 0:3], rec[:, 3:6]
                    ref = rec[:, 6].astype(np.int64)
                    cnt = rec[:, 7].astype(np.int64)
                    t0 = (lo[None] - ro[:, None]) * ri[:, None]
                    t1 = (hi[None] - ro[:, None]) * ri[:, None]
                    tn = np.minimum(t0, t1).max(axis=2)
                    tf = np.maximum(t0, t1).min(axis=2)
                    need = (tn <= tf) & (tf > 0)
                    any_need = need.any(axis=0)
                    for k in range(8):
                        if not any_need[k]:
                            continue
                        if cnt[k] > 0:
                            total += int(cnt[k])
                        elif ref[k] > 0:
                            stack.append(int(ref[k]))
        return total / len(gids)

    cur = delivered_for(pid_current(size, th, tw))
    blk = delivered_for(pid_rowblocks(size, th, tw))
    print(f"tris={scene.n_triangles} chunks={len(chunks)} image={size} "
          f"tile={th}x{tw}")
    print(f"delivered leaf tests/ray @128-ray rows, 4x32 bands:   {cur:9.1f}")
    print(f"delivered leaf tests/ray @128-ray rows, 8x16 blocks:  {blk:9.1f}")
    print(f"layout gain: {cur / blk:5.2f}x")


if __name__ == "__main__":
    main()

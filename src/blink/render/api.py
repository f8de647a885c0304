"""L5 rendering pipeline entry: render an image from a Scene + RenderConfig
(SURVEY.md §3.1). The whole spp/bounce loop is one jitted XLA program; the
host dispatches exactly once per render (megakernel-free wavefront form:
separate kernels per stage inside one program, BASELINE.json:5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from blink.config import RenderConfig
from blink.render.camera import generate_rays
from blink.render.integrators import INTEGRATORS, li_path
from blink.scene.scene import Scene

Array = jnp.ndarray


def render_rays(
    o: Array,
    d: Array,
    keys: Array,
    scene: Scene,
    backend,
    integrator: str,
    max_depth: int,
    deterministic: bool = False,
    compact: bool = False,
    soft_sigma: float = 0.0,
    soft_hw: "tuple[int, int] | None" = None,
    rr_start: int = 0,
) -> Array:
    """Radiance for an arbitrary ray batch (the unit the wavefront shards).

    soft_hw: image shape for mesh-silhouette soft gradients (rays must be
    in row-major pixel order; see diff.soft)."""
    if integrator == "path":
        return li_path(
            o, d, keys, scene, backend, max_depth, deterministic, compact,
            rr_start=rr_start,
        )
    if soft_sigma > 0.0:
        from blink.diff.soft import li_direct_soft

        return li_direct_soft(
            o, d, keys, scene, backend, deterministic, soft_sigma,
            hw=soft_hw,
        )
    return INTEGRATORS[integrator](o, d, keys, scene, backend, deterministic)


def _tile_perm(h: int, w: int, tile=None) -> "np.ndarray | None":
    """Pixel permutation putting each packet-sized pixel tile into one
    contiguous packet — the spatial coherence the Pallas packet-traversal
    kernel needs (kernels.traverse_pallas). SQUARE tiles are preferred:
    a 64x64 tile's frustum is ~2x tighter than a 32x128 strip's, which
    directly shrinks the per-packet union of visited leaves (measured
    ~1.3-1.5x fewer delivered triangle tests). None if the image doesn't
    tile evenly (the kernel still works, just with row-strip packets)."""
    import numpy as np

    from blink.kernels.traverse_pallas import LANES, RAY_ROWS

    n_pack = RAY_ROWS * LANES
    if tile is None:
        side = int(np.sqrt(n_pack))
        tile = (side, side) if (h % side == 0 and w % side == 0) else (
            RAY_ROWS, LANES
        )
    th, tw = tile
    assert th * tw == n_pack, f"tile {tile} != packet size {n_pack}"
    if h % th or w % tw:
        return None
    ids = np.arange(h * w).reshape(h, w)
    tiles = [
        ids[r : r + th, c : c + tw].ravel()
        for r in range(0, h, th)
        for c in range(0, w, tw)
    ]
    return np.concatenate(tiles)


def _tile_shape(h: int, w: int) -> "tuple[int, int] | None":
    """(th, tw) square packet tile if the image tiles evenly, else None."""
    import numpy as np

    from blink.kernels.traverse_pallas import LANES, RAY_ROWS

    n_pack = RAY_ROWS * LANES
    side = int(np.sqrt(n_pack))
    for th, tw in ((side, side), (RAY_ROWS, LANES)):
        if th * tw == n_pack and h % th == 0 and w % tw == 0:
            return th, tw
    return None


def _block_shape(th: int, tw: int) -> "tuple[int, int] | None":
    """Sub-block decomposition of a packet tile so that each leaf-cull
    GROUP of the wide kernel (8 packet rows = 1024 consecutive rays —
    one full 8-sublane vreg, the hardware floor of cull granularity)
    covers a SQUARE pixel block. For the 64x64 tile that is 2x2 blocks
    of 32x32: a square group frustum is tighter than the 16x64 band the
    plain raster order gives, so `any(need)` gates skip more leaf tests
    at zero kernel cost."""
    import numpy as np

    group = 8 * 128  # rows per cull group x lanes
    if th * tw % group:
        return None
    side = int(np.sqrt(group))
    if side * side == group and th % side == 0 and tw % side == 0:
        return side, side
    return None


def tile_pixel_ids(h: int, w: int, th: int, tw: int) -> Array:
    """Arithmetic tile-order pixel ids: entry q is the row-major pixel id
    of the q-th ray when rays are laid out packet-tile by packet-tile
    (with square cull-group sub-blocks inside each tile — _block_shape).

    Replaces the gather-by-permutation of generated rays (measured ~3 ms
    per N-row gather on this chip — core.rows): generate_rays is keyed by
    absolute pixel id, so feeding it THESE ids produces the tiled ray
    order directly with pure elementwise index math."""
    q = jnp.arange(h * w, dtype=jnp.uint32)
    per_tile = th * tw
    tile = q // per_tile
    within = q % per_tile
    ntc = w // tw
    r0 = (tile // ntc) * th
    c0 = (tile % ntc) * tw
    blk = _block_shape(th, tw)
    if blk is None:
        r = r0 + within // tw
        c = c0 + within % tw
    else:
        bh, bw = blk
        nbc = tw // bw
        b = within // (bh * bw)
        sub = within % (bh * bw)
        r = r0 + (b // nbc) * bh + sub // bw
        c = c0 + (b % nbc) * bw + sub % bw
    return r * w + c


def untile_image(
    acc: Array, h: int, w: int, th: int, tw: int, blk=None
) -> Array:
    """Invert tile_pixel_ids ordering: (h*w, 3) tile-order -> (h, w, 3).

    A reshape/transpose (layout change), not a gather/scatter — done once
    per render, after spp accumulation. blk overrides the cull-group
    sub-block shape (used by the spp-interleaved layout)."""
    blk = _block_shape(th, tw) if blk is None else blk
    if blk is None:
        v = acc.reshape(h // th, w // tw, th, tw, 3)
        return v.transpose(0, 2, 1, 3, 4).reshape(h, w, 3)
    bh, bw = blk
    v = acc.reshape(h // th, w // tw, th // bh, tw // bw, bh, bw, 3)
    return v.transpose(0, 2, 4, 1, 3, 5, 6).reshape(h, w, 3)


def tile_pixel_ids_spp(h: int, w: int, sb: int):
    """(pixel_id, sample_idx) for SPP-INTERLEAVED packets: each packet
    carries 4096/sb pixels x sb spp-samples, and each 1024-ray cull group
    (the hardware granularity — see _block_shape) carries a square
    (1024/sb)-pixel patch x sb samples.

    Samples of the SAME pixel follow near-identical paths through the
    BVH, so trading pixels for samples inside a cull group shrinks the
    group's node/leaf-visit union — the packet traversal cost per ray
    drops at spp >= sb with no kernel change. Consecutive sb rays are the
    sb samples of one pixel (fold with .reshape(-1, sb, 3).sum(1))."""
    import numpy as np

    n_pack, group = 32 * 128, 8 * 128
    ps = int(np.sqrt(n_pack // sb))   # packet pixel-patch side
    gs = int(np.sqrt(group // sb))    # cull-group pixel-patch side
    assert ps * ps * sb == n_pack and gs * gs * sb == group
    assert h % ps == 0 and w % ps == 0, (h, w, ps)
    q = jnp.arange(h * w * sb, dtype=jnp.uint32)
    tile = q // n_pack
    within = q % n_pack
    b = within // group
    sub = within % group
    p = sub // sb
    s = sub % sb
    nbc = ps // gs  # blocks per tile side (2 for the 4096/1024 split)
    ntc = w // ps
    r = (tile // ntc) * ps + (b // nbc) * gs + p // gs
    c = (tile % ntc) * ps + (b % nbc) * gs + p % gs
    return r * w + c, s


def render_image(scene: Scene, cfg: RenderConfig, backend) -> Array:
    """Accumulated (H, W, 3) radiance image. Jit-safe; cfg is static."""
    h, w, spp = cfg.height, cfg.width, cfg.spp
    key = jax.random.key(cfg.seed)
    soft_mesh = cfg.soft_mesh and cfg.soft_sigma > 0
    tile = (
        _tile_shape(h, w)
        if getattr(backend, "name", "") == "pallas" and not soft_mesh
        else None
    )
    # geom_dirty (set by api.merge_params on vertex swaps): the table's
    # GEOMETRY lanes are stale and would sever tri_verts gradients, but
    # its uv/material lanes never change under parameter merges — refine
    # keeps the table for those and re-gathers only live vertices (the
    # hybrid dirty mode, diff.hitrefine). Static geometry with no table
    # yet: pack once here, hoisted out of the spp/bounce loops.
    if scene.n_triangles > 0 and hasattr(backend, "shade"):
        if not scene.geom_dirty and backend.shade is None:
            from blink.scene.shade import pack_tri_shade

            backend = backend.replace(shade=pack_tri_shade(scene.triangles))
    # SPP interleaving: at spp>=4 on the tiled pallas path, pack 4
    # samples of each pixel into the same cull group (tile_pixel_ids_spp)
    # — same per-(pixel,sample) RNG keys, so radiance values are
    # identical to the per-sample loop; only the f32 accumulation
    # association differs.
    sb = 1
    if tile is not None and h % 32 == 0 and w % 32 == 0:
        want = cfg.spp_block if cfg.spp_block else 4
        if want in (4, 16, 64) and spp % want == 0:
            sb = want
        elif spp % 4 == 0:
            sb = 4  # requested block doesn't divide spp: default block
    if sb > 1:
        pid, sidx = tile_pixel_ids_spp(h, w, sb)
    else:
        pid = tile_pixel_ids(h, w, *tile) if tile is not None else None

    jitter = cfg.jitter and not cfg.deterministic

    def one_sample(s):
        o, d, pkeys = generate_rays(
            scene.camera, h, w, key, s, jitter, pixel_id=pid
        )
        soft_hw = (h, w) if soft_mesh else None
        return render_rays(
            o, d, pkeys, scene, backend, cfg.integrator, cfg.max_depth,
            cfg.deterministic, cfg.compact, cfg.soft_sigma,
            soft_hw if tile is None else None, cfg.rr_start,
        )

    def one_batch(bi):
        o, d, pkeys = generate_rays(
            scene.camera, h, w, key, sidx + jnp.uint32(bi * sb), jitter,
            pixel_id=pid,
        )
        li = render_rays(
            o, d, pkeys, scene, backend, cfg.integrator, cfg.max_depth,
            cfg.deterministic, cfg.compact, cfg.soft_sigma, None,
            cfg.rr_start,
        )
        return li.reshape(-1, sb, 3).sum(axis=1)

    # Accumulate in whatever dtype the pipeline produces (f32 normally; f64
    # end-to-end when the scene is cast for FD validation).
    if sb > 1:
        batch0 = jax.eval_shape(one_batch, jnp.int32(0))
        acc = jax.lax.fori_loop(
            0, spp // sb, lambda b, a: a + one_batch(b),
            jnp.zeros((h * w, 3), batch0.dtype),
        )
        import numpy as np

        ps = int(np.sqrt(32 * 128 // sb))
        gs = int(np.sqrt(8 * 128 // sb))
        return untile_image(acc / spp, h, w, ps, ps, blk=(gs, gs))
    sample0 = jax.eval_shape(one_sample, jnp.int32(0))
    acc = jax.lax.fori_loop(
        0, spp, lambda s, a: a + one_sample(s),
        jnp.zeros((h * w, 3), sample0.dtype),
    )
    acc = acc / spp
    if tile is not None:
        return untile_image(acc, h, w, *tile)
    return acc.reshape(h, w, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_jit(scene: Scene, cfg: RenderConfig, backend) -> Array:
    # `backend` is a pytree: its BVH arrays are jit *arguments* (device
    # resident, donate-able) — never baked into the program as constants.
    return render_image(scene, cfg, backend)


def render(scene: Scene, cfg: RenderConfig, backend=None) -> Array:
    """User-facing render. Builds the backend if not supplied."""
    if backend is None:
        from blink.kernels.api import make_backend

        backend = make_backend(cfg.backend, scene)
    return _render_jit(scene, cfg, backend)

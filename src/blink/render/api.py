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
) -> Array:
    """Radiance for an arbitrary ray batch (the unit the wavefront shards).

    soft_hw: image shape for mesh-silhouette soft gradients (rays must be
    in row-major pixel order; see diff.soft)."""
    if integrator == "path":
        return li_path(
            o, d, keys, scene, backend, max_depth, deterministic, compact
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


def render_image(scene: Scene, cfg: RenderConfig, backend) -> Array:
    """Accumulated (H, W, 3) radiance image. Jit-safe; cfg is static."""
    h, w, spp = cfg.height, cfg.width, cfg.spp
    key = jax.random.key(cfg.seed)
    perm = _tile_perm(h, w) if getattr(backend, "name", "") == "pallas" else None

    def one_sample(s):
        jitter = cfg.jitter and not cfg.deterministic
        o, d, pkeys = generate_rays(scene.camera, h, w, key, s, jitter)
        soft_hw = (h, w) if (cfg.soft_mesh and cfg.soft_sigma > 0) else None
        if perm is not None:
            # Permuted (pallas-tiled) rays are not in row-major pixel
            # order; mesh soft coverage needs the image lattice, so it is
            # only available on the unpermuted path.
            li_t = render_rays(
                o[perm], d[perm], pkeys[perm], scene, backend,
                cfg.integrator, cfg.max_depth, cfg.deterministic,
                cfg.compact, cfg.soft_sigma,
            )
            return jnp.zeros_like(li_t).at[perm].set(li_t)
        return render_rays(
            o, d, pkeys, scene, backend, cfg.integrator, cfg.max_depth,
            cfg.deterministic, cfg.compact, cfg.soft_sigma, soft_hw,
        )

    def body(s, acc):
        return acc + one_sample(s)

    # Accumulate in whatever dtype the pipeline produces (f32 normally; f64
    # end-to-end when the scene is cast for FD validation).
    sample0 = jax.eval_shape(one_sample, jnp.int32(0))
    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((h * w, 3), sample0.dtype)
    )
    return (acc / spp).reshape(h, w, 3)


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

"""L9 public API: build_scene / render / render_grad / fit
(SURVEY.md §1 L9, §3.1-3.3; BASELINE.json:9 inverse rendering).

`render_grad` realizes call stack §3.2: value_and_grad of pixel-MSE through
the full renderer; gradients flow through hit refinement (gather transpose =
segment-sum scatter over primitives) into any chosen subset of scene
parameters (geometry, materials, lights, camera).
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from blink.ckpt import load_ckpt, save_ckpt
from blink.config import FitConfig, RenderConfig
from blink.obs.log import JsonlLogger, TensorboardLogger
from blink.render.api import render, render_image
from blink.scene.scene import Scene

Array = jnp.ndarray

# Named differentiable parameter views into a Scene. Each entry is
# (getter, merger). Names are what users pass to render_grad/fit.
_PARAMS: dict[str, tuple[Callable[[Scene], Array], Callable[[Scene, Array], Scene]]] = {
    "sphere_center": (
        lambda s: s.spheres.center,
        lambda s, v: s.replace(spheres=s.spheres.replace(center=v)),
    ),
    "sphere_radius": (
        lambda s: s.spheres.radius,
        lambda s, v: s.replace(spheres=s.spheres.replace(radius=v)),
    ),
    "tri_verts": (
        lambda s: s.triangles.verts,
        # geom_dirty: any render of the merged scene must rebuild the
        # packed shading table in-jit (differentiable, never stale)
        # instead of using a backend's precomputed cache.
        lambda s, v: s.replace(
            triangles=s.triangles.replace(verts=v), geom_dirty=True
        ),
    ),
    "albedo": (
        lambda s: s.materials.albedo,
        lambda s, v: s.replace(materials=s.materials.replace(albedo=v)),
    ),
    "emission": (
        lambda s: s.materials.emission,
        lambda s, v: s.replace(materials=s.materials.replace(emission=v)),
    ),
    "textures": (
        lambda s: s.textures,
        lambda s, v: s.replace(textures=v),
    ),
    "cam_origin": (
        lambda s: s.camera.origin,
        lambda s, v: s.replace(camera=s.camera.replace(origin=v)),
    ),
    "cam_look_at": (
        lambda s: s.camera.look_at,
        lambda s, v: s.replace(camera=s.camera.replace(look_at=v)),
    ),
    "cam_fov": (
        lambda s: s.camera.fov_deg,
        lambda s, v: s.replace(camera=s.camera.replace(fov_deg=v)),
    ),
}

PARAM_NAMES = tuple(_PARAMS)


def extract_params(scene: Scene, names: tuple[str, ...]) -> dict[str, Array]:
    return {n: _PARAMS[n][0](scene) for n in names}


def merge_params(scene: Scene, params: dict[str, Array]) -> Scene:
    for n, v in params.items():
        scene = _PARAMS[n][1](scene, v)
    return scene


def build_scene(cfg: RenderConfig) -> Scene:
    from blink.scene import builders, io, scene as sc

    if cfg.scene == "cornell":
        return builders.cornell_box()
    if cfg.scene == "bunny":
        return builders.bunny_scene(cfg.bunny_subdiv)
    if cfg.scene == "sponza":
        return builders.sponza_scene(cfg.sponza_tris)
    if cfg.scene.startswith("obj:"):
        tris = io.load_obj(cfg.scene[4:])
        mats = None
        s = sc.make_scene(triangles=tris, materials=mats)
        return s.replace(lights=sc.derive_lights(s.materials, s.spheres, s.triangles))
    raise KeyError(f"unknown scene '{cfg.scene}'")


def mse(a: Array, b: Array) -> Array:
    return jnp.mean((a - b) ** 2)


def loss_fn(
    params: dict[str, Array],
    scene: Scene,
    cfg: RenderConfig,
    backend,
    target: Array,
) -> Array:
    """Pixel-MSE between render(merge(scene, params)) and target."""
    img = render_image(merge_params(scene, params), cfg, backend)
    return mse(img, target)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_grad_jit(params, scene, cfg, backend, target):
    return jax.value_and_grad(loss_fn)(params, scene, cfg, backend, target)


def render_grad(
    scene: Scene,
    cfg: RenderConfig,
    target: Array,
    param_names: tuple[str, ...] = ("sphere_center", "albedo"),
    backend=None,
):
    """(loss, grads) of pixel-MSE w.r.t. the named scene parameters."""
    if backend is None:
        from blink.kernels.api import make_backend

        backend = make_backend(cfg.backend, scene)
    backend = _drop_stale_shade(backend, param_names)
    params = extract_params(scene, tuple(param_names))
    return _render_grad_jit(params, scene, cfg, backend, target)


def _drop_stale_shade(backend, param_names):
    """Historical hook (kept for call-site stability): when triangle
    vertices are optimized, the table's GEOMETRY lanes go stale — but
    refine's hybrid dirty mode (diff.hitrefine, round-5) now reads only
    the table's uv/material lanes (which no parameter can change) and
    re-gathers vertices live, so the table stays useful and vertex
    gradients flow. Nothing to drop."""
    del param_names
    return backend


def fit(
    scene0: Scene,
    target: Array,
    cfg: RenderConfig,
    fit_cfg: FitConfig | None = None,
    backend=None,
    resume_from: str = "",
):
    """Inverse rendering (config 3, BASELINE.json:9): recover scene params
    from a target image by Adam on pixel MSE. Returns (scene, history)."""
    fit_cfg = fit_cfg or FitConfig()
    if backend is None:
        from blink.kernels.api import make_backend

        backend = make_backend(cfg.backend, scene0)
    backend = _drop_stale_shade(backend, tuple(fit_cfg.optimize))
    # Copy: step_fn donates its params/opt_state buffers; without the copy
    # the first donation would invalidate the caller's scene arrays.
    params = jax.tree_util.tree_map(
        jnp.array, extract_params(scene0, tuple(fit_cfg.optimize))
    )
    opt = optax.adam(fit_cfg.lr)
    opt_state = opt.init(params)
    start_step = 0
    if resume_from:
        start_step, params, opt_state = load_ckpt(resume_from, params, opt_state)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)

    @functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
    def step_fn(params, opt_state, scene, cfg, backend, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, scene, cfg, backend, target
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    log = JsonlLogger(fit_cfg.log_path)
    tb = TensorboardLogger(fit_cfg.tb_dir)
    history = []
    for step in range(start_step, fit_cfg.steps):
        params, opt_state, loss = step_fn(
            params, opt_state, scene0, cfg, backend, target
        )
        loss_f = float(loss)
        history.append(loss_f)
        log.log(step=step, loss=loss_f)
        tb.scalar("fit/loss", loss_f, step)
        if fit_cfg.tb_image_every and (step + 1) % fit_cfg.tb_image_every == 0:
            img = render_image(merge_params(scene0, params), cfg, backend)
            tb.image("fit/render", img, step)
        if (
            fit_cfg.ckpt_path
            and fit_cfg.ckpt_every > 0
            and (step + 1) % fit_cfg.ckpt_every == 0
        ):
            save_ckpt(fit_cfg.ckpt_path, step + 1, params, opt_state)
    log.close()
    tb.close()
    return merge_params(scene0, params), history

"""Integration: inverse rendering recovers perturbed scene parameters
(config 3, BASELINE.json:9; SURVEY.md §4.6).

Albedo recovery exercises the smooth part of the differentiation layer
(exact fixed-topology gradients). Sphere-position recovery additionally
needs silhouette (visibility-edge) gradients — provided by the soft-
visibility mode (blink.diff.soft) — and is tested in test_fit_positions.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from blink.api import build_scene, fit
from blink.config import FitConfig, get_config
from blink.render.api import render


def test_fit_recovers_albedo(tmp_path):
    cfg = get_config("fit").override(
        width=32, height=32, deterministic=True, backend="brute"
    )
    scene = build_scene(cfg)
    target = render(scene, cfg)

    key = jax.random.key(11)
    true_albedo = scene.materials.albedo
    noise = 0.25 * jax.random.uniform(key, true_albedo.shape, true_albedo.dtype)
    scene0 = scene.replace(
        materials=scene.materials.replace(
            albedo=jnp.clip(true_albedo + noise, 0.05, 0.95)
        )
    )
    err0 = float(jnp.abs(scene0.materials.albedo - true_albedo).mean())

    fit_cfg = FitConfig(
        steps=80,
        lr=2e-2,
        optimize=("albedo",),
        ckpt_every=40,
        ckpt_path=str(tmp_path / "ck.safetensors"),
        log_path=str(tmp_path / "log.jsonl"),
    )
    fitted, history = fit(scene0, target, cfg, fit_cfg)
    assert len(history) == 80
    assert history[-1] < history[0] * 0.1, history[:3] + history[-3:]
    err1 = float(jnp.abs(fitted.materials.albedo - true_albedo).mean())
    assert err1 < err0 * 0.5, (err0, err1)
    assert (tmp_path / "log.jsonl").exists()
    assert (tmp_path / "ck.safetensors").exists()


def test_fit_resume_continues(tmp_path):
    cfg = get_config("fit").override(
        width=16, height=16, deterministic=True, backend="brute"
    )
    scene = build_scene(cfg)
    target = render(scene, cfg)
    key = jax.random.key(3)
    scene0 = scene.replace(
        materials=scene.materials.replace(
            albedo=jnp.clip(
                scene.materials.albedo
                + 0.2 * jax.random.uniform(key, scene.materials.albedo.shape,
                                           scene.materials.albedo.dtype),
                0.05, 0.95,
            )
        )
    )
    ck = str(tmp_path / "r.safetensors")
    # Phase 1: 10 steps, checkpoint at 10.
    _, h1 = fit(
        scene0, target, cfg,
        FitConfig(steps=10, lr=1e-2, optimize=("albedo",),
                  ckpt_every=10, ckpt_path=ck),
    )
    # Phase 2: resume to 20.
    fitted2, h2 = fit(
        scene0, target, cfg,
        FitConfig(steps=20, lr=1e-2, optimize=("albedo",),
                  ckpt_every=0, ckpt_path=""),
        resume_from=ck,
    )
    assert len(h2) == 10  # steps 10..19 only
    assert h2[-1] <= h1[0]


@pytest.mark.smoke
def test_fit_recovers_sphere_positions_soft():
    """Config 3 proper (BASELINE.json:9): sphere POSITION recovery.

    Fixed-topology gradients alone cannot descend this loss (silhouette
    terms dominate — see diff.soft); with soft-visibility gradients
    (cfg.soft_sigma) Adam recovers the positions. Forward images are
    identical in soft mode (verified below), only gradients change.
    """
    cfg = get_config("fit").override(
        width=48, height=48, deterministic=True, backend="brute"
    )
    scene = build_scene(cfg)
    target = render(scene, cfg)
    cfg_soft = cfg.override(soft_sigma=0.15)
    np.testing.assert_array_equal(
        np.asarray(render(scene, cfg_soft)), np.asarray(target)
    )

    key = jax.random.key(11)
    noise = 0.08 * jax.random.normal(
        key, scene.spheres.center.shape, scene.spheres.center.dtype
    )
    scene0 = scene.replace(
        spheres=scene.spheres.replace(center=scene.spheres.center + noise)
    )
    err0 = float(jnp.abs(noise).mean())

    fitted, history = fit(
        scene0, target, cfg_soft,
        FitConfig(steps=120, lr=1e-2, optimize=("sphere_center",)),
    )
    err1 = float(jnp.abs(fitted.spheres.center - scene.spheres.center).mean())
    assert history[-1] < history[0] * 0.45, (history[0], history[-1])
    assert err1 < err0 * 0.6, (err0, err1)


@pytest.mark.smoke
def test_fit_recovers_mesh_offset_soft():
    """Mesh silhouette gradients (VERDICT r1 #7; BASELINE.json:5
    'differentiable w.r.t. geometry'): recover a rigid translation of the
    bunny-class mesh through tri_verts. Fixed-topology gradients barely see
    a translation (silhouette flux dominates); the SoftRas-lite mesh soft
    coverage (diff.soft, cfg.soft_mesh) makes it descend. Forward images
    are identical in soft mode (checked)."""
    import optax

    from blink.api import extract_params, merge_params
    from blink.kernels.api import make_backend
    from blink.render.api import render_image
    from blink.scene.builders import bunny_scene

    scene = bunny_scene(2)  # 320-tri icosphere + floor + light
    cfg = get_config("bunny").override(
        width=48, height=48, deterministic=True, spp=1, backend="brute"
    )
    be = make_backend("brute", scene)
    target = render_image(scene, cfg, be)
    cfg_soft = cfg.override(soft_sigma=1.0, soft_mesh=True)
    np.testing.assert_array_equal(
        np.asarray(render_image(scene, cfg_soft, be)), np.asarray(target)
    )

    p0 = extract_params(scene, ("tri_verts",))["tri_verts"]
    mesh_rows = jnp.zeros((p0.shape[0], 1)).at[8:].set(1.0)  # icosphere rows

    def loss(offset):
        tv = p0 + mesh_rows * offset[None, :]
        s = merge_params(scene, {"tri_verts": tv})
        return jnp.mean((render_image(s, cfg_soft, be) - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    p = jnp.asarray([0.05, -0.03, 0.0])
    err0 = float(jnp.linalg.norm(p))
    opt = optax.adam(8e-3)
    st = opt.init(p)
    l0 = None
    for _ in range(50):
        l, g = vg(p)
        l0 = float(l) if l0 is None else l0
        up, st = opt.update(g, st, p)
        p = optax.apply_updates(p, up)
    assert float(jnp.linalg.norm(p)) < err0 * 0.5, (err0, p)
    assert float(l) < l0 * 0.25, (l0, float(l))


def test_fit_recovers_camera_look_at():
    """Camera-pose optimization (BASELINE.json:5 'differentiable w.r.t.
    ... camera'; VERDICT r2 #8): recover a perturbed cam_look_at.

    Pointwise FD validation is impossible for camera rotation at test
    resolution — the hard-visibility loss is so jagged that central
    differences swing from 0.21 to -189 between eps=1e-3 and 1e-2
    (measured; see docs/PARITY.md 'camera gradients'). The functional
    criterion is what users need: gradient descent on pixel MSE recovers
    the true VIEW DIRECTION (cam_look_at has a gauge freedom along the
    view ray, so the metric is angular). Fixed-topology interior-shading
    gradients alone recover it on this scene."""
    import optax

    from blink.api import extract_params, merge_params
    from blink.kernels.api import make_backend
    from blink.render.api import render_image

    cfg = get_config("cornell").override(
        width=40, height=40, deterministic=True, backend="brute"
    )
    scene = build_scene(cfg)
    be = make_backend("brute", scene)
    target = render_image(scene, cfg, be)
    p = extract_params(scene, ("cam_look_at", "cam_origin"))
    true_la, origin = p["cam_look_at"], p["cam_origin"]

    def dir_err(la):
        v1 = (la - origin) / jnp.linalg.norm(la - origin)
        v0 = (true_la - origin) / jnp.linalg.norm(true_la - origin)
        return float(jnp.arccos(jnp.clip(jnp.dot(v1, v0), -1.0, 1.0)))

    x0 = true_la + jnp.asarray([0.08, 0.12, -0.06])
    sched = optax.cosine_decay_schedule(2e-2, 100)
    opt = optax.adam(sched)

    @jax.jit
    def step(x, st):
        def loss(v):
            s = merge_params(scene, {"cam_look_at": v})
            return jnp.mean((render_image(s, cfg, be) - target) ** 2)

        l, g = jax.value_and_grad(loss)(x)
        up, st = opt.update(g, st)
        return optax.apply_updates(x, up), st, l

    x, st = x0, opt.init(x0)
    for _ in range(100):
        x, st, _ = step(x, st)
    e0, e1 = dir_err(x0), dir_err(x)
    assert e1 < e0 * 0.15, (e0, e1)


@pytest.mark.smoke
def test_soft_mesh_camera_gradient_sane():
    """Regression guard for the interior-edge phantom-flux bug: with a
    BLACK residual layer, coplanar triangle pairs (quad diagonals) left
    ~25% phantom transmittance whose screen position moves with the
    camera — the soft cam_look_at gradient measured -89 vs FD 0.21.
    With the hard-radiance residual (diff.soft), the soft-mode camera
    gradient must stay within a small factor of the hard-mode one."""
    from blink.api import extract_params, merge_params
    from blink.kernels.api import make_backend
    from blink.render.api import render_image

    cfg = get_config("cornell").override(
        width=32, height=32, deterministic=True, backend="brute"
    )
    scene = build_scene(cfg)
    be = make_backend("brute", scene)
    x0 = extract_params(scene, ("cam_look_at",))["cam_look_at"]

    def grad_of(cfgx):
        def loss(v):
            s = merge_params(scene, {"cam_look_at": v})
            return jnp.mean(render_image(s, cfgx, be) ** 2)

        return jax.jit(jax.grad(loss))(x0)

    g_hard = grad_of(cfg)
    g_soft = grad_of(cfg.override(soft_sigma=0.8, soft_mesh=True))
    assert bool(jnp.all(jnp.isfinite(g_soft)))
    ratio = float(jnp.linalg.norm(g_soft) / (jnp.linalg.norm(g_hard) + 1e-12))
    assert ratio < 5.0, f"soft/hard grad norm ratio {ratio} (phantom flux?)"


def test_fit_tensorboard_summaries(tmp_path):
    """SURVEY.md §5 observability: tensorboard scalars + image summaries."""
    cfg = get_config("fit").override(
        width=16, height=16, deterministic=True, backend="brute"
    )
    scene = build_scene(cfg)
    target = render(scene, cfg)
    tb = str(tmp_path / "tb")
    fit(
        scene, target, cfg,
        FitConfig(steps=3, lr=1e-2, optimize=("albedo",),
                  tb_dir=tb, tb_image_every=2),
    )
    import os

    files = []
    for root, _, fn in os.walk(tb):
        files += [f for f in fn if "tfevents" in f]
    assert files, "no tensorboard event files written"

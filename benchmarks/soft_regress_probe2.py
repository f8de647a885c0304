"""Localize the 34fb0fb divergence: which term of the mesh-soft estimator
pushes the offset AWAY from zero, and what does FD say the true gradient
direction is.

Decomposition at p0 = [0.05, -0.03, 0]:
  g_hard  = AD grad with residual=hard   (diverges)
  g_none  = AD grad with residual=None   (converges)
  g_fd    = central FD of the (hard) loss, eps sweep — the visibility-flux
            ground truth the soft estimator is supposed to approximate.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import blink.diff.soft as soft_mod
from blink.api import extract_params, merge_params
from blink.config import get_config
from blink.kernels.api import make_backend
from blink.render.api import render_image
from blink.scene.builders import bunny_scene

scene = bunny_scene(2)
cfg = get_config("bunny").override(
    width=48, height=48, deterministic=True, spp=1, backend="brute")
be = make_backend("brute", scene)
target = render_image(scene, cfg, be)
cfg_soft = cfg.override(soft_sigma=1.0, soft_mesh=True)
cfg_hardonly = cfg
p0v = extract_params(scene, ("tri_verts",))["tri_verts"]
mesh_rows = jnp.zeros((p0v.shape[0], 1)).at[8:].set(1.0)
p0 = jnp.asarray([0.05, -0.03, 0.0])


def loss_soft(offset, residual_mode):
    tv = p0v + mesh_rows * offset[None, :]
    s = merge_params(scene, {"tri_verts": tv})
    # replicate render_image's soft path but with residual_mode control:
    # easiest is to monkeypatch _mesh_soft_radiance's residual arg.
    orig = soft_mod._mesh_soft_radiance

    def patched(o, d, keys, sc, backend, det, sigma, hw, hit,
                residual_radiance=None):
        if residual_mode == "none":
            residual_radiance = None
        return orig(o, d, keys, sc, backend, det, sigma, hw, hit,
                    residual_radiance=residual_radiance)

    soft_mod._mesh_soft_radiance = patched
    try:
        img = render_image(s, cfg_soft, be)
    finally:
        soft_mod._mesh_soft_radiance = orig
    return jnp.mean((img - target) ** 2)


def loss_hard(offset):
    tv = p0v + mesh_rows * offset[None, :]
    s = merge_params(scene, {"tri_verts": tv})
    return jnp.mean((render_image(s, cfg_hardonly, be) - target) ** 2)


g_hard = np.asarray(jax.grad(lambda p: loss_soft(p, "hard"))(p0))
g_none = np.asarray(jax.grad(lambda p: loss_soft(p, "none"))(p0))

jl = jax.jit(loss_hard)
print(f"loss(p0) = {float(jl(p0)):.5e}  loss(0) = {float(jl(jnp.zeros(3))):.5e}")
for eps in (3e-3, 1e-2, 3e-2):
    g_fd = np.array([
        (float(jl(p0 + eps * jnp.eye(3)[i])) - float(jl(p0 - eps * jnp.eye(3)[i])))
        / (2 * eps)
        for i in range(3)
    ])
    print(f"g_fd(eps={eps:g})   = {g_fd}")


def ang(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return float(np.degrees(np.arccos(np.clip(np.dot(a, b) / (na * nb + 1e-30), -1, 1))))


print(f"g_hard = {g_hard}  |g|={np.linalg.norm(g_hard):.3e}")
print(f"g_none = {g_none}  |g|={np.linalg.norm(g_none):.3e}")
# Descent direction check: the true descent dir is roughly -p0/|p0| (loss
# minimized at offset 0).
desc = -np.asarray(p0) / np.linalg.norm(p0)
print(f"angle(g_hard, +p0-ward) = {ang(g_hard, -desc):.1f} deg (0 = points uphill correctly... )")
print(f"angle(-g_hard, desc) = {ang(-g_hard, desc):.1f} deg  (0 = perfect descent)")
print(f"angle(-g_none, desc) = {ang(-g_none, desc):.1f} deg")

print("\n=== gradient field along the ray s*p0_dir ===")
for s in (2.0, 4.0, 8.0):
    pp = p0 * s
    gh = np.asarray(jax.grad(lambda p: loss_soft(p, "hard"))(pp))
    gn = np.asarray(jax.grad(lambda p: loss_soft(p, "none"))(pp))
    eps = 1e-2
    gf = np.array([
        (float(jl(pp + eps * jnp.eye(3)[i])) - float(jl(pp - eps * jnp.eye(3)[i])))
        / (2 * eps) for i in range(3)])
    d = -np.asarray(pp) / np.linalg.norm(pp)
    print(f"s={s}: |p|={np.linalg.norm(pp):.3f} loss={float(jl(pp)):.4e}")
    print(f"  g_fd   = {gf}   ang(-g,desc)={ang(-gf,d):.0f}")
    print(f"  g_hard = {gh}   ang={ang(-gh,d):.0f}")
    print(f"  g_none = {gn}   ang={ang(-gn,d):.0f}")

"""A/B the opaque-last-layer mesh-soft estimator against all three
functional criteria (VERDICT r3 ask #2): mesh-offset recovery, camera
gradient sanity ratio, camera look-at recovery.

Forces the CPU backend (fast compiles) via jax.config — env vars are
ignored because sitecustomize pre-imports jax on axon.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from blink.api import build_scene, extract_params, merge_params
from blink.config import get_config
from blink.kernels.api import make_backend
from blink.render.api import render_image
from blink.scene.builders import bunny_scene

# --- 1. mesh-offset recovery (test_fit_recovers_mesh_offset_soft) ---
scene = bunny_scene(2)
cfg = get_config("bunny").override(
    width=48, height=48, deterministic=True, spp=1, backend="brute")
be = make_backend("brute", scene)
target = render_image(scene, cfg, be)
cfg_soft = cfg.override(soft_sigma=1.0, soft_mesh=True)
np.testing.assert_array_equal(
    np.asarray(render_image(scene, cfg_soft, be)), np.asarray(target))
print("forward identical in soft mode: OK")

p0v = extract_params(scene, ("tri_verts",))["tri_verts"]
mesh_rows = jnp.zeros((p0v.shape[0], 1)).at[8:].set(1.0)


def loss(offset):
    tv = p0v + mesh_rows * offset[None, :]
    s = merge_params(scene, {"tri_verts": tv})
    return jnp.mean((render_image(s, cfg_soft, be) - target) ** 2)


vg = jax.jit(jax.value_and_grad(loss))
p = jnp.asarray([0.05, -0.03, 0.0])
err0 = float(jnp.linalg.norm(p))
opt = optax.adam(8e-3)
st = opt.init(p)
l0 = None
for i in range(50):
    l, g = vg(p)
    l0 = float(l) if l0 is None else l0
    up, st = opt.update(g, st, p)
    p = optax.apply_updates(p, up)
    if i % 10 == 0:
        print(f"  step {i:3d} loss {float(l):.3e} |p| {float(jnp.linalg.norm(p)):.4f}")
err1 = float(jnp.linalg.norm(p))
print(f"OFFSET: |p| {err0:.4f} -> {err1:.4f} (pass < {err0*0.5:.4f}); "
      f"loss {l0:.3e} -> {float(l):.3e} (pass < {l0*0.25:.3e})")
ok1 = err1 < err0 * 0.5 and float(l) < l0 * 0.25

# --- 2. camera gradient sanity (test_soft_mesh_camera_gradient_sane) ---
cfg_c = get_config("cornell").override(
    width=32, height=32, deterministic=True, backend="brute")
scene_c = build_scene(cfg_c)
be_c = make_backend("brute", scene_c)
x0 = extract_params(scene_c, ("cam_look_at",))["cam_look_at"]


def grad_of(cfgx):
    def loss(v):
        s = merge_params(scene_c, {"cam_look_at": v})
        return jnp.mean(render_image(s, cfgx, be_c) ** 2)

    return jax.jit(jax.grad(loss))(x0)


g_hard = grad_of(cfg_c)
g_soft = grad_of(cfg_c.override(soft_sigma=0.8, soft_mesh=True))
ratio = float(jnp.linalg.norm(g_soft) / (jnp.linalg.norm(g_hard) + 1e-12))
print(f"CAMERA GRAD: soft/hard norm ratio = {ratio:.3f} (pass < 5.0), "
      f"finite={bool(jnp.all(jnp.isfinite(g_soft)))}")
ok2 = ratio < 5.0 and bool(jnp.all(jnp.isfinite(g_soft)))

print("PASS" if (ok1 and ok2) else "FAIL", {"offset": ok1, "cam": ok2})

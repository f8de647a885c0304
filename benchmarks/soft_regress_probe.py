"""Diagnose the 34fb0fb soft-mesh regression (VERDICT r3 weak #1).

Runs the exact test_fit_recovers_mesh_offset_soft optimization under
variants of the mesh-soft residual-radiance term and prints the
trajectory of (loss, |p|) so the divergence source is measurable.

Usage: JAX_PLATFORMS=cpu python benchmarks/soft_regress_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax

import blink.diff.soft as soft_mod
from blink.api import extract_params, merge_params
from blink.config import get_config
from blink.kernels.api import make_backend
from blink.render.api import render_image
from blink.scene.builders import bunny_scene


def run(label, residual_mode):
    # Patch li_direct_soft's residual choice.
    orig = soft_mod.li_direct_soft

    def patched(o, d, keys, scene, backend, deterministic, sigma, hw=None):
        from blink.render.integrators import li_direct
        from blink.scene.scene import empty_spheres

        hard = li_direct(o, d, keys, scene, backend, deterministic)
        out = hard
        if scene.n_spheres > 0:
            scene_bg = scene.replace(spheres=empty_spheres())
            l_bg = li_direct(o, d, keys, scene_bg, backend, deterministic)
            alpha, t_star, idx = soft_mod._sphere_soft_terms(o, d, scene, sigma)
            geom = soft_mod._sphere_geom(o, d, scene, t_star, idx, alpha > 0.0)
            from blink.render.integrators import nee_direct
            l_sph = geom.emission + nee_direct(
                scene, geom, keys, backend, bounce=0,
                deterministic=deterministic)
            s = alpha[:, None] * l_sph + (1.0 - alpha[:, None]) * l_bg
            out = out + (s - jax.lax.stop_gradient(s))
        if hw is not None and scene.n_triangles > 0:
            hit = backend.intersect(o, d, scene)
            if residual_mode == "hard":
                res = hard
            elif residual_mode == "hard_sg":
                res = jax.lax.stop_gradient(hard)
            else:
                res = None
            soft_m = soft_mod._mesh_soft_radiance(
                o, d, keys, scene, backend, deterministic, sigma, hw, hit,
                residual_radiance=res)
            out = out + (soft_m - jax.lax.stop_gradient(soft_m))
        return out

    soft_mod.li_direct_soft = patched
    import blink.render.integrators as integ
    if hasattr(integ, "li_direct_soft"):
        integ.li_direct_soft = patched
    import blink.render.api as rapi
    # render path imports: check how soft is dispatched
    try:
        scene = bunny_scene(2)
        cfg = get_config("bunny").override(
            width=48, height=48, deterministic=True, spp=1, backend="brute")
        be = make_backend("brute", scene)
        target = render_image(scene, cfg, be)
        cfg_soft = cfg.override(soft_sigma=1.0, soft_mesh=True)
        p0 = extract_params(scene, ("tri_verts",))["tri_verts"]
        mesh_rows = jnp.zeros((p0.shape[0], 1)).at[8:].set(1.0)

        def loss(offset):
            tv = p0 + mesh_rows * offset[None, :]
            s = merge_params(scene, {"tri_verts": tv})
            return jnp.mean((render_image(s, cfg_soft, be) - target) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        p = jnp.asarray([0.05, -0.03, 0.0])
        opt = optax.adam(8e-3)
        st = opt.init(p)
        traj = []
        for i in range(50):
            l, g = vg(p)
            if i % 10 == 0 or i == 49:
                traj.append((i, float(l), float(jnp.linalg.norm(p))))
            up, st = opt.update(g, st, p)
            p = optax.apply_updates(p, up)
        print(f"[{label}] traj (step, loss, |p|):")
        for t in traj:
            print(f"  {t[0]:3d}  {t[1]:.3e}  {t[2]:.4f}")
        print(f"[{label}] final |p|={float(jnp.linalg.norm(p)):.4f} "
              f"(start 0.0583, pass<0.0292)")
    finally:
        soft_mod.li_direct_soft = orig


if __name__ == "__main__":
    for mode in [sys.argv[1]] if len(sys.argv) > 1 else ["hard", "none", "hard_sg"]:
        run(mode, mode)

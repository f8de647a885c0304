#!/usr/bin/env python
"""Config-3 demo (BASELINE.json:9): recover perturbed sphere positions AND
albedo from a target image via pixel-MSE gradients, with soft-silhouette
position gradients (diff.soft) and tensorboard logging.

    python examples/inverse_rendering.py [--steps 200] [--tb /tmp/tb]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--soft-sigma", type=float, default=0.15)
    ap.add_argument("--tb", default="")
    ap.add_argument("--out", default="/tmp/blink_fit")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from blink.api import build_scene, fit
    from blink.config import FitConfig, get_config
    from blink.render.api import render
    from blink.scene.io import save_image_ppm

    cfg = get_config("fit").override(
        width=args.size, height=args.size, deterministic=True,
        backend="brute", soft_sigma=args.soft_sigma,
    )
    scene = build_scene(cfg)
    target = render(scene, cfg)

    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)
    scene0 = scene.replace(
        spheres=scene.spheres.replace(
            center=scene.spheres.center
            + 0.08 * jax.random.normal(k1, scene.spheres.center.shape, jnp.float32)
        ),
        materials=scene.materials.replace(
            albedo=jnp.clip(
                scene.materials.albedo
                + 0.2 * jax.random.uniform(k2, scene.materials.albedo.shape),
                0.05, 0.95,
            )
        ),
    )
    err0 = float(jnp.abs(scene0.spheres.center - scene.spheres.center).mean())

    os.makedirs(args.out, exist_ok=True)
    save_image_ppm(os.path.join(args.out, "target.ppm"), np.asarray(target))
    save_image_ppm(
        os.path.join(args.out, "initial.ppm"), np.asarray(render(scene0, cfg))
    )

    fitted, history = fit(
        scene0, target, cfg,
        FitConfig(
            steps=args.steps, lr=args.lr,
            optimize=("sphere_center", "albedo"),
            tb_dir=args.tb, tb_image_every=25 if args.tb else 0,
            log_path=os.path.join(args.out, "fit.jsonl"),
            ckpt_path=os.path.join(args.out, "ckpt.safetensors"),
            ckpt_every=50,
        ),
    )
    err1 = float(jnp.abs(fitted.spheres.center - scene.spheres.center).mean())
    save_image_ppm(
        os.path.join(args.out, "fitted.ppm"), np.asarray(render(fitted, cfg))
    )
    print(
        f"loss {history[0]:.5f} -> {history[-1]:.5f}; "
        f"position error {err0:.4f} -> {err1:.4f}; artifacts in {args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

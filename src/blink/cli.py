"""CLI: python -m blink {render,fit,bench} --config <name|file.json> ...
(SURVEY.md §2 "CLI"; the five BASELINE.json configs are runnable by name:
cornell, bunny, fit, sponza, pod — SURVEY.md §7.3).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default="cornell", help="preset name or .json path")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--max-depth", dest="max_depth", type=int, default=None)
    p.add_argument("--integrator", default=None, choices=["primary", "direct", "path"])
    p.add_argument("--backend", default=None, choices=["auto", "brute", "bvh", "pallas"])
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--deterministic", action="store_true", default=None)
    p.add_argument("--scene", default=None, help="cornell|bunny|sponza|obj:<path>")
    p.add_argument("--sponza-tris", dest="sponza_tris", type=int, default=None)
    p.add_argument("--soft-sigma", dest="soft_sigma", type=float, default=None,
                   help="soft-silhouette gradient scale (0=off; images unchanged)")


def _load_cfg(args: argparse.Namespace):
    from blink.config import get_config

    cfg = get_config(args.config)
    return cfg.override(
        width=args.width,
        height=args.height,
        spp=args.spp,
        max_depth=args.max_depth,
        integrator=args.integrator,
        backend=args.backend,
        seed=args.seed,
        deterministic=args.deterministic,
        scene=args.scene,
        sponza_tris=args.sponza_tris,
        soft_sigma=args.soft_sigma,
    )


def cmd_render(args: argparse.Namespace) -> int:
    import jax

    from blink.api import build_scene
    from blink.render.api import render
    from blink.scene.io import save_image_npy, save_image_ppm

    cfg = _load_cfg(args)
    scene = build_scene(cfg)
    from blink.obs.profile import trace

    t0 = time.perf_counter()
    prof = trace(getattr(args, "profile", ""))
    prof.__enter__()
    if getattr(args, "dist", 0):
        from blink.dist import dist_render, make_mesh

        img = jax.block_until_ready(
            dist_render(scene, cfg, mesh=make_mesh(args.dist))
        )
    else:
        img = jax.block_until_ready(render(scene, cfg))
    prof.__exit__(None, None, None)
    dt = time.perf_counter() - t0
    rays = cfg.width * cfg.height * cfg.spp
    print(
        json.dumps(
            {
                "cmd": "render",
                "config": args.config,
                "wall_s": dt,
                "rays": rays,
                "rays_per_s": rays / dt,
            }
        )
    )
    if args.out:
        if args.out.endswith(".ppm"):
            save_image_ppm(args.out, img)
        else:
            save_image_npy(args.out, img)
    return 0


def cmd_fit(args: argparse.Namespace) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blink.api import build_scene, fit
    from blink.config import FitConfig
    from blink.render.api import render

    cfg = _load_cfg(args)
    scene = build_scene(cfg)
    target = jnp.asarray(np.load(args.target)) if args.target else render(scene, cfg)
    # Perturb the scene, then recover (BASELINE.json:9).
    key = jax.random.key(cfg.seed + 1)
    if scene.n_spheres > 0:
        noise = 0.15 * jax.random.normal(key, scene.spheres.center.shape, scene.spheres.center.dtype)
        scene0 = scene.replace(
            spheres=scene.spheres.replace(center=scene.spheres.center + noise)
        )
    else:
        scene0 = scene
    fit_cfg = FitConfig(
        steps=args.steps,
        lr=args.lr,
        ckpt_path=args.ckpt or "",
        log_path=args.log or "",
        tb_dir=getattr(args, "tb", "") or "",
    )
    fitted, history = fit(scene0, target, cfg, fit_cfg, resume_from=args.resume or "")
    print(
        json.dumps(
            {
                "cmd": "fit",
                "steps": len(history),
                "loss_first": history[0] if history else None,
                "loss_last": history[-1] if history else None,
            }
        )
    )
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    from blink.benchmarks.harness import run_bench

    if getattr(args, "hosts", "") or getattr(args, "auto_pool", False):
        # Multi-host: one command per host (VERDICT r2 #6). --hosts takes
        # the pool IP list (equivalent to PALLAS_AXON_POOL_IPS); with no
        # value, init_distributed autodetects the env pool if present.
        import os

        from blink.dist.mesh import init_distributed

        if args.hosts:
            os.environ["PALLAS_AXON_POOL_IPS"] = args.hosts
            if args.process_id is not None:
                os.environ["PALLAS_AXON_PROCESS_ID"] = str(args.process_id)
        init_distributed()
    result = run_bench(args.config, quick=args.quick)
    print(json.dumps(result))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="blink")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a config to an image")
    _add_common(pr)
    pr.add_argument("--out", default="", help=".npy or .ppm output path")
    pr.add_argument(
        "--dist", type=int, default=0, metavar="N",
        help="shard rays over an N-device mesh (config 5 path; N=0 single)",
    )
    pr.add_argument(
        "--profile", default="",
        help="write a jax.profiler trace to this logdir (tensorboard-viewable)",
    )
    pr.set_defaults(fn=cmd_render)

    pf = sub.add_parser("fit", help="inverse rendering (config 3)")
    _add_common(pf)
    pf.add_argument("--steps", type=int, default=100)
    pf.add_argument("--lr", type=float, default=2e-2)
    pf.add_argument("--target", default="", help=".npy target image (default: self-render)")
    pf.add_argument("--ckpt", default="")
    pf.add_argument("--resume", default="")
    pf.add_argument("--log", default="")
    pf.add_argument("--tb", default="", help="tensorboard logdir")
    pf.set_defaults(fn=cmd_fit)

    pb = sub.add_parser("bench", help="benchmark harness")
    pb.add_argument("--config", default="sponza")
    pb.add_argument("--quick", action="store_true")
    pb.add_argument(
        "--hosts", default="",
        help="comma-separated pool host IPs (multi-host init; run the "
             "same command on every host). Empty + --auto-pool: use "
             "PALLAS_AXON_POOL_IPS from the environment",
    )
    pb.add_argument(
        "--auto-pool", action="store_true",
        help="initialize multi-host from the axon pool env if present",
    )
    pb.add_argument(
        "--process-id", type=int, default=None,
        help="this host's index in --hosts (default: match local IPs)",
    )
    pb.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

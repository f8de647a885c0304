"""Integrators: primary/direct Lambertian and depth-k path tracing with NEE
(SURVEY.md §2 "Integrators"; BASELINE.json:7,8,10).

All integrators are branchless over ray state (alive masks, not control
flow) and take an intersection `Backend` (brute force, JAX BVH, or Pallas
BVH) so the same estimator runs against every traversal implementation —
that is what the parity tests in tests/ compare.

Light strategy: pure next-event estimation — emission is only counted on
camera-visible emitters (bounce 0); every path vertex adds one NEE sample
(uniform light choice, area sampling). Unbiased for diffuse scenes and much
lower variance than BSDF sampling at the spec's spp counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.core import sampler, vec
from blink.diff.brdf import INV_PI, sample_cosine
from blink.diff.hitrefine import HitGeom, refine
from blink.sampling.lights import sample_light_point
from blink.scene.scene import Scene

# Backend (the intersection implementation pytree) is defined in
# blink.kernels.api; integrators use it by duck typing to keep the layer
# dependency strictly downward (SURVEY.md §1).

Array = jnp.ndarray

#: normal offset applied to secondary/shadow ray origins.
RAY_EPS = 1e-3


#: stochastic NEE light samples are shared per 128-ray row (the kernel's
#: lane width) for shadow-packet coherence — see nee_direct. Module-level
#: switch (not cfg) because it changes only noise correlation, never the
#: estimator's expectation; flip for variance experiments.
NEE_SHARE_ROW = True

#: bounce-wavefront dead-lane cull (round 5): pass the alive mask into the
#: closest-hit so dead lanes (escaped / zero-throughput paths — 37%+ of
#: lanes from bounce 1 on the headline scene) skip the walk via t_far=0
#: instead of re-tracing their stale ray at full cost. EXACT: dead-lane
#: contributions were always masked out of the radiance sum; this only
#: removes the work (test_path_dead_lane_cull_exact asserts bit-identical
#: radiance). Module switch for A/B probes only.
CULL_DEAD = True

#: fixed barycentrics that place a triangle-light sample at its centroid
#: (u1 = 4/9, u2 = 1/2 under the sqrt warp). Used by deterministic mode and
#: mirrored exactly by the numpy oracle (blink.ref.renderer).
DET_U1 = 4.0 / 9.0
DET_U2 = 0.5


def _light_contrib(
    scene: Scene, geom: HitGeom, backend, light: Array, u1: Array, u2: Array,
    light_rows: Array | None = None,
) -> Array:
    """Shadow-ray-tested contribution of one sampled light point (pdf-area
    weighted, no light-choice factor)."""
    from blink.core.rows import select_rows

    p_l, n_l, pdf_area, mat_l = sample_light_point(
        scene, light, u1, u2, rows=light_rows
    )
    to_l = p_l - geom.p
    dist2 = vec.vdot(to_l, to_l)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi = to_l / dist[..., None]
    cos_s = jnp.maximum(vec.vdot(geom.n, wi), 0.0)
    cos_l = jnp.abs(vec.vdot(n_l, wi))  # two-sided emitters
    emit = select_rows(scene.materials.emission, mat_l)

    shadow_o = geom.p + geom.n * RAY_EPS
    # t_far=0 for rays whose primary MISSED: their contribution is masked
    # by `active` below either way, but without this they still walk the
    # whole tree from a garbage origin (37% of rays at sponza 1024² —
    # hit_fraction 0.63). tf=0 fails every slab test, so dead lanes cost
    # one root visit instead of a full any-hit walk. Exact by construction.
    t_far = jnp.where(
        geom.valid, jax.lax.stop_gradient(dist) * (1.0 - 1e-3), 0.0
    )
    blocked = backend.occluded(shadow_o, wi, scene, t_far)

    geom_term = cos_s * cos_l / jnp.maximum(dist2, 1e-8)
    weight = geom_term / jnp.maximum(pdf_area, vec.EPS)
    f = geom.albedo * INV_PI
    contrib = f * emit * weight[..., None]
    active = geom.valid & ~blocked
    return jnp.where(active[..., None], contrib, 0.0)


def nee_direct(
    scene: Scene, geom: HitGeom, keys: Array, backend, bounce,
    deterministic: bool = False,
) -> Array:
    """Next-event estimate of direct lighting at each hit.

    Stochastic mode: one sample, uniform light choice. Deterministic mode
    (golden images, FD validation — SURVEY.md §4.4-4.5): sum over every
    light sampled at a fixed interior point; a smooth, noise-free function
    of the scene parameters.
    """
    from blink.sampling.lights import pack_light_rows

    n = geom.t.shape[0]
    if scene.n_lights == 0:
        return jnp.zeros((n, 3), jnp.float32)
    n_lights = scene.n_lights
    light_rows = pack_light_rows(scene)
    if deterministic:
        # Static unroll: one shadow-ray pass PER LIGHT. Deterministic mode
        # exists for oracles/goldens/FD on few-light scenes; a many-light
        # scene would blow up trace size and run time — fail loudly.
        if n_lights > 16:
            raise ValueError(
                f"deterministic light sampling unrolls over lights; "
                f"{n_lights} lights would emit {n_lights} shadow passes. "
                f"Use stochastic NEE (deterministic=False) for many-light "
                f"scenes."
            )
        total = jnp.zeros((n, 3), jnp.float32)
        u1 = jnp.full((n,), DET_U1, jnp.float32)
        u2 = jnp.full((n,), DET_U2, jnp.float32)
        for l in range(n_lights):
            light = jnp.full((n,), l, jnp.int32)
            total = total + _light_contrib(
                scene, geom, backend, light, u1, u2, light_rows
            )
        return total
    if NEE_SHARE_ROW and keys.shape[-1] >= 4:
        # Shadow-ray coherence (VERDICT r3 ask #4): draw the light sample
        # (choice + area uvs) from the per-IMAGE-BLOCK stream (keys[2:4],
        # sampler.block_key: 4x32-pixel blocks = one 128-lane kernel
        # row's footprint) — one shared target per block, so each row's
        # shadow packet is a coherent cone toward one light point.
        # Unbiased: the sample is drawn independently of each ray's own
        # position, so every ray's estimate is a valid single-sample NEE
        # estimate; only the noise correlates within a block
        # (decorrelated across spp samples and bounces). Keyed by
        # absolute block id, NOT ray order: radiance is unchanged by
        # sharding/compaction/tile permutation. Measured on chip
        # (benchmarks/shadow_probe.py, 512^2/1M): per-ray targets
        # 2.51 Mrays/s vs one-point 9.57 / det-light 8.11 — direction
        # spread is the entire 12x incoherent-shadow gap;
        # Morton-sorting origins does nothing (2.36).
        stream = keys[..., 2:4]
    else:
        stream = keys[..., :2]
    bk = jax.vmap(lambda k: sampler.bounce_key(k, bounce))(stream)
    u = jax.vmap(lambda k: sampler.uniform(k, (3,), dim=0))(bk)
    light = jnp.minimum(
        jnp.asarray(u[:, 0] * n_lights, jnp.int32), n_lights - 1
    )
    contrib = _light_contrib(
        scene, geom, backend, light, u[:, 1], u[:, 2], light_rows
    )
    return contrib * n_lights  # 1 / P(choose light)


def li_direct(
    o: Array, d: Array, keys: Array, scene: Scene, backend,
    deterministic: bool = False,
) -> Array:
    """Emission + direct lighting (configs 1-2: BASELINE.json:7,8)."""
    hit = backend.intersect(o, d, scene)
    geom = refine(o, d, hit, scene, shade=getattr(backend, "shade", None))
    return geom.emission + nee_direct(
        scene, geom, keys, backend, bounce=0, deterministic=deterministic
    )


def li_path(
    o: Array,
    d: Array,
    keys: Array,
    scene: Scene,
    backend,
    max_depth: int = 4,
    deterministic: bool = False,
    compact: bool = False,
    rr_start: int = 0,
) -> Array:
    """Path tracing to `max_depth` with NEE at each vertex (config 4).

    Wavefront form as a lax.fori_loop over bounces: the whole ray batch is
    carried with an alive mask. With compact=True, rays are re-sorted in
    HBM between bounces (render.wavefront) — dead rays sink to the tail
    and live rays regain spatial coherence for the Pallas packet kernel.
    RNG keys travel with the rays (counter-based on pixel id), so the
    image is identical with or without compaction.

    rr_start > 0 enables Russian-roulette termination at the end of every
    bounce b >= rr_start: a path survives with p = clamp(max(beta), .05, 1)
    and its throughput is divided by p — the standard unbiased estimator
    (E[beta'·X] = p·(beta/p)·X = beta·X). Killed lanes are then zero-cost:
    CULL_DEAD + compaction turn them into skipped cull groups. Off (0) by
    default and forced off in deterministic mode (goldens/FD need smooth,
    noise-free renders); the stochastic production presets (config 4/5)
    opt in. Mean-consistency is measured, not argued:
    tests/test_estimators.py::test_russian_roulette_mean_consistency."""
    n = o.shape[0]
    use_rr = rr_start > 0 and not deterministic

    def body(b, state):
        o, d, beta, radiance, alive, keys, ray_ix = state
        hit = backend.intersect(
            o, d, scene, alive=alive if CULL_DEAD else None
        )
        geom = refine(o, d, hit, scene, shade=getattr(backend, "shade", None))
        alive = alive & geom.valid

        # Camera-visible emitters only (NEE covers indirect emitter hits).
        is_first = b == 0
        radiance = radiance + jnp.where(
            (alive & is_first)[..., None], geom.emission, 0.0
        )
        nee = nee_direct(
            scene, geom, keys, backend, bounce=b, deterministic=deterministic
        )
        radiance = radiance + jnp.where(alive[..., None], beta * nee, 0.0)

        # Cosine-sample the next direction; f*cos/pdf = albedo exactly.
        bk = jax.vmap(lambda k: sampler.bounce_key(k, b))(keys[..., :2])
        u = jax.vmap(lambda k: sampler.uniform(k, (2,), dim=1))(bk)
        new_d = sample_cosine(geom.n, u[:, 0], u[:, 1])
        new_o = geom.p + geom.n * RAY_EPS
        beta = beta * geom.albedo
        # Kill paths with (near-)zero throughput (emitters have albedo 0).
        alive = alive & (jnp.max(beta, axis=-1) > 1e-5)
        if use_rr:
            # Russian roulette (dim=2 of the bounce stream; dims 0/1 are
            # NEE and cosine sampling). `b` is a traced loop index, so the
            # gate is a lax.select, not Python control flow.
            bk_rr = jax.vmap(lambda k: sampler.bounce_key(k, b))(
                keys[..., :2]
            )
            u_rr = jax.vmap(lambda k: sampler.uniform(k, (1,), dim=2))(
                bk_rr
            )[:, 0]
            p = jnp.clip(jnp.max(beta, axis=-1), 0.05, 1.0)
            do_rr = b >= rr_start
            survive = jnp.logical_or(~do_rr, u_rr < p)
            beta = beta * jnp.where(do_rr, 1.0 / p, 1.0)[..., None]
            alive = alive & survive
        o = jnp.where(alive[..., None], new_o, o)
        d = jnp.where(alive[..., None], new_d, d)

        if compact:
            from blink.render.wavefront import compaction_order

            perm = compaction_order(alive, o, d)
            o = o[perm]
            d = d[perm]
            beta = beta[perm]
            radiance = radiance[perm]
            alive = alive[perm]
            keys = keys[perm]
            ray_ix = ray_ix[perm]
        return o, d, beta, radiance, alive, keys, ray_ix

    # Dtype-stable carry: probe what one bounce produces (f32 normally, f64
    # under the FD-validation configuration) so the fori_loop carry matches.
    probe = jax.eval_shape(
        lambda oo, dd: nee_direct(
            scene,
            refine(oo, dd, backend.intersect(oo, dd, scene), scene),
            keys,
            backend,
            0,
            deterministic,
        ),
        o,
        d,
    )
    dt = probe.dtype
    # Derive every carry init from the (possibly shard_map-varying) ray
    # arrays so the loop carries type-match under jax.shard_map's varying
    # manual-axes checking in any context (fresh jnp.zeros would be
    # unvarying and rejected inside a sharded region).
    # (o alone can be UNVARYING — it is a broadcast camera origin — while
    # d varies per pixel; absorb both.)
    zero3 = (o.astype(dt) + d.astype(dt)) * 0
    state = (
        o.astype(dt) + zero3,
        d.astype(dt),
        zero3 + 1.0,
        zero3,
        zero3[..., 0] == zero3[..., 0],
        keys,
        jnp.arange(n, dtype=jnp.int32) + zero3[..., 0].astype(jnp.int32),
    )
    _, _, _, radiance, _, _, ray_ix = jax.lax.fori_loop(
        0, max_depth, body, state
    )
    if compact:
        # Scatter per-ray radiance back to original ray order.
        radiance = jnp.zeros_like(radiance).at[ray_ix].set(radiance)
    return radiance


INTEGRATORS = {
    "primary": li_direct,
    "direct": li_direct,
    "path": li_path,
}

"""Estimator-consistency tests for production stochastic-sampling changes
(SURVEY.md §4 oracle discipline; VERDICT r4 weak #4).

The block-shared NEE light sample (integrators.NEE_SHARE_ROW) changed the
PRODUCTION stochastic estimator: light choice + area uvs are drawn from the
per-image-block stream instead of the per-pixel stream, so each 4x32 block's
shadow packet aims at one shared light point. That is argued unbiased (the
sample is independent of each ray's position) — this test MEASURES it: the
two estimators must converge to the same mean within CLT noise bounds.
"""
import numpy as np
import pytest

from blink.api import build_scene
from blink.config import get_config
from blink.render import integrators
from blink.render.api import render_image


def _render_mean(scene, cfg, share: bool, seeds) -> list[np.ndarray]:
    """Stochastic renders with NEE_SHARE_ROW forced to `share`.

    render_image is called UN-jitted: NEE_SHARE_ROW is a module constant
    read at trace time, so a cached jit would ignore the flip.
    """
    from blink.kernels.api import make_backend

    backend = make_backend("brute", scene)
    old = integrators.NEE_SHARE_ROW
    integrators.NEE_SHARE_ROW = share
    try:
        return [
            np.asarray(render_image(scene, cfg.override(seed=s), backend))
            for s in seeds
        ]
    finally:
        integrators.NEE_SHARE_ROW = old


@pytest.mark.slow
def test_nee_share_row_mean_consistency():
    """Block-shared NEE == per-pixel NEE in expectation.

    Self-calibrating CLT bound: the seed-to-seed spread of each estimator
    at the same spp measures its own noise floor; the cross-estimator mean
    difference must sit inside that spread (x2 margin). A real estimator
    bug (e.g. a wrong 1/P(light) factor, or a sample correlated with ray
    position) shifts the mean by O(signal), far outside the bound.
    """
    cfg = get_config("cornell").override(
        width=32, height=32, spp=192, deterministic=False, backend="brute"
    )
    scene = build_scene(cfg)
    seeds = (11, 23)
    on_a, on_b = _render_mean(scene, cfg, True, seeds)
    off_a, off_b = _render_mean(scene, cfg, False, seeds)

    # Per-image means (the unbiasedness claim is about expectations).
    on_mean = 0.5 * (on_a + on_b)
    off_mean = 0.5 * (off_a + off_b)
    # Noise floor: seed-to-seed spread of each estimator. Block sharing
    # correlates noise WITHIN a block, so the shared estimator's spread is
    # the larger of the two — exactly why it calibrates the bound.
    noise = max(
        np.abs(on_a - on_b).mean(), np.abs(off_a - off_b).mean()
    )
    diff = np.abs(on_mean - off_mean).mean()
    assert diff < 2.0 * noise + 1e-5, (
        f"mean diff {diff:.5f} exceeds CLT bound 2*{noise:.5f} — "
        f"block-shared NEE is biased vs per-pixel NEE"
    )
    # And both lit: guard against the vacuous all-black pass.
    assert on_mean.max() > 0.05 and off_mean.max() > 0.05

    # Documented correlation structure: within one 4x32 block the shared
    # estimator's per-seed deviations are MORE correlated than the
    # per-pixel estimator's (the sharing is real, not a no-op).
    def block_corr(a, b):
        # mean |block-mean deviation| between two seeds, blocks of 4x32.
        d = (a - b).reshape(8, 4, 1, 32, 3).mean(axis=(1, 3))
        return np.abs(d).mean()

    assert block_corr(on_a, on_b) > block_corr(off_a, off_b)


def test_path_dead_lane_cull_exact():
    """CULL_DEAD bounce culling is EXACT, not statistical: dead-lane
    contributions were always masked out of li_path's radiance sum, so
    skipping their walks (alive -> t_far=0) must be bit-identical on a
    stochastic path render with escaped rays + emitter-killed paths."""
    from blink.kernels.api import make_backend

    cfg = get_config("cornell").override(
        width=16, height=16, spp=4, deterministic=False, backend="brute",
        integrator="path", max_depth=4,
    )
    scene = build_scene(cfg)
    backend = make_backend("brute", scene)
    old = integrators.CULL_DEAD
    try:
        integrators.CULL_DEAD = True
        img_on = np.asarray(render_image(scene, cfg, backend))
        integrators.CULL_DEAD = False
        img_off = np.asarray(render_image(scene, cfg, backend))
    finally:
        integrators.CULL_DEAD = old
    assert img_on.max() > 0.01  # non-vacuous
    np.testing.assert_array_equal(img_on, img_off)


def test_intersect_alive_mask_parity():
    """All backends return the canonical dead-lane miss, and live lanes
    are untouched by the mask (bvh vs brute vs no-mask)."""
    import jax.numpy as jnp

    from blink.kernels.api import make_backend

    cfg = get_config("cornell").override(backend="brute")
    scene = build_scene(cfg)
    brute = make_backend("brute", scene)
    bvh = make_backend("bvh", scene)
    rng = np.random.default_rng(7)
    n = 256
    o = jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)
    d0 = rng.normal(size=(n, 3))
    d = jnp.asarray(d0 / np.linalg.norm(d0, axis=-1, keepdims=True),
                    jnp.float32)
    alive = jnp.asarray(rng.random(n) < 0.6)

    h_none = brute.intersect(o, d, scene)
    h_brute = brute.intersect(o, d, scene, alive=alive)
    h_bvh = bvh.intersect(o, d, scene, alive=alive)
    am = np.asarray(alive)
    for h in (h_brute, h_bvh):
        # Dead lanes: canonical miss.
        assert np.all(np.asarray(h.kind)[~am] == 0)
        assert np.all(np.asarray(h.prim)[~am] == 0)
        # Live lanes: identical to the unmasked brute result.
        np.testing.assert_array_equal(
            np.asarray(h.kind)[am], np.asarray(h_none.kind)[am]
        )
        np.testing.assert_array_equal(
            np.asarray(h.prim)[am], np.asarray(h_none.prim)[am]
        )
        np.testing.assert_allclose(
            np.asarray(h.t)[am], np.asarray(h_none.t)[am], rtol=1e-6
        )


@pytest.mark.slow
def test_russian_roulette_mean_consistency():
    """rr_start termination is unbiased: high-spp path renders with RR on
    vs off must agree in the mean within the self-calibrated CLT bound
    (same discipline as the NEE-share test above). A wrong 1/p factor
    shifts indirect radiance by O(signal)."""
    from blink.kernels.api import make_backend

    base = get_config("cornell").override(
        width=32, height=32, spp=256, deterministic=False, backend="brute",
        integrator="path", max_depth=4,
    )
    scene = build_scene(base)
    backend = make_backend("brute", scene)
    seeds = (5, 17)

    def renders(rr):
        cfg = base.override(rr_start=rr)
        return [
            np.asarray(render_image(scene, cfg.override(seed=s), backend))
            for s in seeds
        ]

    on_a, on_b = renders(1)
    off_a, off_b = renders(0)
    on_mean = 0.5 * (on_a + on_b)
    off_mean = 0.5 * (off_a + off_b)
    noise = max(np.abs(on_a - on_b).mean(), np.abs(off_a - off_b).mean())
    diff = np.abs(on_mean - off_mean).mean()
    assert diff < 2.0 * noise + 1e-5, (
        f"mean diff {diff:.5f} exceeds CLT bound 2*{noise:.5f} — "
        f"russian roulette is biased"
    )
    assert on_mean.max() > 0.05 and off_mean.max() > 0.05
    # RR raises variance (that is the trade): its seed spread should be
    # >= the plain estimator's (sanity that RR actually engaged).
    assert np.abs(on_a - on_b).mean() >= 0.5 * np.abs(off_a - off_b).mean()

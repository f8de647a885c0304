"""Wavefront compaction tests: the compacted path integrator renders the
identical image (RNG travels with rays), and the ordering invariants hold."""
import jax
import jax.numpy as jnp
import numpy as np

from blink.api import build_scene
from blink.config import get_config
from blink.kernels.api import make_backend
from blink.render.api import render_image
from blink.render.wavefront import compaction_order


def test_compaction_order_invariants():
    rng = np.random.default_rng(0)
    n = 512
    alive = jnp.asarray(rng.random(n) < 0.6)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    perm = np.asarray(compaction_order(alive, o, d))
    assert sorted(perm.tolist()) == list(range(n))  # a permutation
    a_sorted = np.asarray(alive)[perm]
    # All dead rays strictly after all live rays.
    first_dead = np.argmax(~a_sorted) if (~a_sorted).any() else n
    assert not a_sorted[first_dead:].any()
    # Live rays grouped by octant (non-decreasing octant id).
    dn = np.asarray(d)[perm][a_sorted]
    octant = (dn[:, 0] < 0) * 1 + (dn[:, 1] < 0) * 2 + (dn[:, 2] < 0) * 4
    assert (np.diff(octant) >= 0).all()


def test_path_compaction_identical_image():
    cfg = get_config("cornell").override(
        width=24, height=24, integrator="path", max_depth=3, spp=2, seed=3,
        backend="brute",
    )
    scene = build_scene(cfg)
    backend = make_backend("brute", scene)
    img_plain = np.asarray(
        jax.jit(lambda s: render_image(s, cfg, backend))(scene)
    )
    cfg_c = cfg.override(compact=True)
    img_comp = np.asarray(
        jax.jit(lambda s: render_image(s, cfg_c, backend))(scene)
    )
    np.testing.assert_array_equal(img_comp, img_plain)
    assert img_plain.max() > 0.01

"""Pool-gated multi-device Pallas parity (VERDICT r3 ask #7;
BASELINE.json:5 "N>=2 hosts" row). Skips unless >1 real device is
attached (an axon pool via PALLAS_AXON_POOL_IPS, or any multi-chip
slice): the day a pod appears, this file produces the sharded-Pallas
evidence with zero code edits.

Asserts the grid-blocked Mosaic kernels under shard_map produce a
bit-identical image to the single-device render, and that scene-param
gradients agree across the mesh (the psum all-reduce path).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blink.api import extract_params, loss_fn
from blink.config import get_config
from blink.dist import dist_render, dist_render_grad, make_mesh
from blink.kernels.api import make_backend
from blink.render.api import render
from blink.scene.builders import bunny_scene

multichip = pytest.mark.skipif(
    jax.device_count() < 2,
    reason=f"needs >1 device (have {jax.device_count()}); attach an axon "
    "pool (PALLAS_AXON_POOL_IPS) to activate",
)


@multichip
def test_dist_render_pallas_multichip_bit_identical():
    scene = bunny_scene(2)
    cfg = get_config("bunny").override(
        width=64, height=64, spp=1, deterministic=True, backend="pallas"
    )
    be = make_backend("pallas", scene)
    img1 = np.asarray(render(scene, cfg, be))
    for n in (2, jax.device_count()):
        img_n = np.asarray(dist_render(scene, cfg, be, make_mesh(n)))
        np.testing.assert_array_equal(img_n, img1)


@multichip
def test_dist_grads_pallas_multichip_allclose():
    scene = bunny_scene(2)
    cfg = get_config("bunny").override(
        width=48, height=48, spp=1, deterministic=True, backend="pallas"
    )
    be = make_backend("pallas", scene)
    target = jnp.zeros((48, 48, 3), jnp.float32)
    params = extract_params(scene, ("albedo", "emission"))
    l1, g1 = jax.value_and_grad(loss_fn)(params, scene, cfg, be, target)
    mesh = make_mesh(jax.device_count())
    ln, gn = dist_render_grad(
        scene, cfg, target, ("albedo", "emission"), be, mesh
    )
    assert np.allclose(float(ln), float(l1), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(gn[k]), np.asarray(g1[k]), rtol=1e-5, atol=1e-7
        )

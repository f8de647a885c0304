"""Gradient coverage for the FLAGSHIP path (VERDICT r1 "next round" #4):

  (a) pallas-backend vs brute gradient parity on a real BVH mesh scene
      (interpret mode on CPU — the exact production call graph: chunked
      multi-pass traversal -> fixed-topology refine -> NEE shading);
  (b) f64 FD validation through the PATH integrator at depth >= 2 with a
      texture atlas bound (config-4 differentiability, BASELINE.json:10);
  (c) direct unit tests of diff.scatter.scatter_grads[_masked].

Spec: BASELINE.json:2 "grad allclose vs FD reference" for the flagship
path, not just the brute/direct oracle path.
"""
import jax

jax.config.update("jax_enable_x64", True)  # FD needs f64 (see test_grads)

import jax.numpy as jnp
import numpy as np

from blink.api import build_scene, extract_params, merge_params
from blink.config import get_config
from blink.kernels.api import make_backend
from blink.render.api import render_image
from blink.scene.builders import bunny_scene, checker_texture


def _to_f64(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def test_pallas_backend_grad_parity_bvh_scene():
    """jax.grad through the pallas backend == through brute, on a mesh
    scene large enough to exercise a real SAH tree (320-tri bunny)."""
    scene = bunny_scene(subdiv=2)  # 20*4^2=320 mesh tris + floor + light
    cfg = get_config("bunny").override(
        width=32, height=32, deterministic=True, spp=1
    )
    b_brute = make_backend("brute", scene)
    b_pallas = make_backend("pallas", scene)  # CPU -> interpret mode

    def loss(albedo, tv, backend):
        s = merge_params(scene, {"albedo": albedo, "tri_verts": tv})
        img = render_image(s, cfg, backend)
        return jnp.mean(img**2)

    p = extract_params(scene, ("albedo", "tri_verts"))
    g = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=())
    ga_br, gv_br = jax.grad(loss, argnums=(0, 1))(
        p["albedo"], p["tri_verts"], b_brute
    )
    ga_pl, gv_pl = jax.grad(loss, argnums=(0, 1))(
        p["albedo"], p["tri_verts"], b_pallas
    )
    np.testing.assert_allclose(
        np.asarray(ga_pl), np.asarray(ga_br), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gv_pl), np.asarray(gv_br), rtol=1e-4, atol=1e-6
    )
    assert float(jnp.abs(ga_pl).max()) > 0  # light actually flows


def test_path_textured_grads_match_fd():
    """f64 central FD vs AD through li_path depth=3 with a bound texture —
    the config-4 differentiation surface (path + textured BRDFs)."""
    cfg = get_config("cornell").override(
        width=24,
        height=24,
        deterministic=True,
        spp=1,
        integrator="path",
        max_depth=3,
        backend="brute",
    )
    base = _to_f64(build_scene(cfg))
    tex = jnp.asarray(checker_texture(8, 2), jnp.float64)[None]
    scene = base.replace(
        textures=tex,
        materials=base.materials.replace(
            texture_id=base.materials.texture_id.at[0].set(0)  # floor
        ),
    )
    backend = make_backend("brute", scene)

    def loss_of(albedo, atlas):
        s = merge_params(scene, {"albedo": albedo})
        s = s.replace(textures=atlas)
        img = render_image(s, cfg, backend)
        return jnp.mean(img**2)

    jl = jax.jit(loss_of)
    a0 = np.asarray(extract_params(scene, ("albedo",))["albedo"], np.float64)
    x0 = np.asarray(tex, np.float64)
    g_alb, g_tex = jax.grad(loss_of, argnums=(0, 1))(
        jnp.asarray(a0), jnp.asarray(x0)
    )
    g_alb, g_tex = np.asarray(g_alb), np.asarray(g_tex)
    assert np.isfinite(g_alb).all() and np.isfinite(g_tex).all()

    rng = np.random.default_rng(1)
    # FD a subsample of albedo entries and texels (full FD is expensive).
    # Entries at exactly 0 (the light material) sit ON the path-kill
    # threshold kink (max(beta) > eps): the estimator is one-sided there,
    # so central FD measures half the right-derivative while AD correctly
    # returns the (zero) derivative of the dead branch. FD validation, as
    # everywhere in this suite, samples smooth points only.
    smooth = np.flatnonzero(a0.reshape(-1) > 0.0)
    for ix in rng.choice(smooth, 6, replace=False):
        xp, xm = a0.copy().reshape(-1), a0.copy().reshape(-1)
        xp[ix] += 1e-3
        xm[ix] -= 1e-3
        fd = (
            float(jl(xp.reshape(a0.shape), x0))
            - float(jl(xm.reshape(a0.shape), x0))
        ) / 2e-3
        ad = g_alb.reshape(-1)[ix]
        assert abs(ad - fd) < max(1e-4, 2e-2 * abs(fd)), ("albedo", ix, ad, fd)
    for ix in rng.choice(x0.size, 6, replace=False):
        xp, xm = x0.copy().reshape(-1), x0.copy().reshape(-1)
        xp[ix] += 1e-3
        xm[ix] -= 1e-3
        fd = (
            float(jl(a0, xp.reshape(x0.shape)))
            - float(jl(a0, xm.reshape(x0.shape)))
        ) / 2e-3
        ad = g_tex.reshape(-1)[ix]
        assert abs(ad - fd) < max(1e-4, 2e-2 * abs(fd)), ("texel", ix, ad, fd)


def test_scatter_grads_unit():
    """diff.scatter: per-ray rows sum into per-prim buckets; invalid /
    masked rays are dropped (VERDICT r1: directly unit-test this module)."""
    from blink.diff.scatter import scatter_grads, scatter_grads_masked

    per_ray = jnp.asarray(
        np.array(
            [[1.0, 2.0], [10.0, 20.0], [100.0, 200.0], [0.5, 0.25]], np.float64
        )
    )
    prim = jnp.asarray([2, 0, 2, 5], jnp.int32)  # 5 is out of range (n=3)
    out = np.asarray(scatter_grads(per_ray, prim, n_prims=3))
    np.testing.assert_allclose(out[0], [10.0, 20.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0])
    np.testing.assert_allclose(out[2], [101.0, 202.0])

    mask = jnp.asarray([True, False, True, True])
    outm = np.asarray(
        scatter_grads_masked(per_ray, prim, mask, n_prims=3)
    )
    np.testing.assert_allclose(outm[0], [0.0, 0.0])  # ray 1 masked off
    np.testing.assert_allclose(outm[2], [101.0, 202.0])
    # Out-of-range prim with mask=True parks in the overflow bucket.
    assert outm.shape == (3, 2)

    # scatter_grads is the explicit transpose of a gather: check against AD.
    table = jnp.asarray(np.arange(6, dtype=np.float64).reshape(3, 2))
    ids = jnp.asarray([2, 0, 2, 1], jnp.int32)

    def f(tab):
        return jnp.sum(tab[ids] * per_ray)

    g_ad = np.asarray(jax.grad(f)(table))
    g_sc = np.asarray(scatter_grads(per_ray, ids, n_prims=3))
    np.testing.assert_allclose(g_ad, g_sc)

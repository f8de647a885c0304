"""Unit tests: scene builders, OBJ loader, textures, config round-trip."""
import jax.numpy as jnp
import numpy as np

from blink.api import build_scene
from blink.config import PRESETS, RenderConfig, get_config
from blink.scene.builders import bunny_scene, cornell_box, icosphere, sponza_scene
from blink.scene.io import load_obj
from blink.scene.textures import sample_texture


def test_cornell_shapes():
    s = cornell_box()
    assert s.n_spheres == 8
    assert s.n_triangles == 4  # 2 quads
    assert s.n_lights == 2  # emissive quad = 2 tri lights
    assert s.materials.albedo.shape[0] == 10


def test_bunny_tri_count():
    s = bunny_scene(subdiv=3)  # small for test speed
    assert s.n_triangles == 4 + 20 * 4**3
    assert s.n_lights == 2


def test_sponza_tri_budget():
    s = sponza_scene(n_tris=30_000)
    assert 25_000 <= s.n_triangles <= 31_000
    assert s.textures.shape[0] == 2
    assert s.n_lights == 2


def test_icosphere_on_unit_sphere():
    v, f, uv = icosphere(2, radius=2.0, center=(1.0, 0.0, 0.0))
    r = np.linalg.norm(v - np.array([1.0, 0.0, 0.0]), axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=1e-5)
    assert f.shape[0] == 20 * 16
    assert uv.shape == (v.shape[0], 2)


def test_obj_loader(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        """# comment
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
f 1/1 2/2 3/3
f 2/2 4/1 3/3
"""
    )
    tris = load_obj(str(p), material_id=5)
    assert tris.idx.shape == (2, 3)
    assert tris.verts.shape == (4, 3)
    assert int(tris.material_id[0]) == 5
    np.testing.assert_allclose(np.asarray(tris.uv[1]), [1.0, 0.0])


def test_texture_bilinear_exact_and_interp():
    atlas = jnp.zeros((1, 4, 4, 3)).at[0, 0, 1].set(jnp.ones(3))
    tid = jnp.asarray([0], jnp.int32)
    # Texel center of (row 0, col 1): uv = ((1+0.5)/4, (0+0.5)/4)
    v = sample_texture(atlas, tid, jnp.asarray([[1.5 / 4, 0.5 / 4]]))
    np.testing.assert_allclose(np.asarray(v[0]), 1.0, atol=1e-6)
    # Halfway to the next texel: 0.5 blend.
    v2 = sample_texture(atlas, tid, jnp.asarray([[2.0 / 4, 0.5 / 4]]))
    np.testing.assert_allclose(np.asarray(v2[0]), 0.5, atol=1e-6)
    # tex_id -1 -> 1.0
    v3 = sample_texture(atlas, jnp.asarray([-1]), jnp.asarray([[0.3, 0.7]]))
    np.testing.assert_allclose(np.asarray(v3[0]), 1.0)


def test_config_json_roundtrip():
    cfg = get_config("sponza").override(spp=2)
    cfg2 = RenderConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
    assert set(PRESETS) == {"cornell", "bunny", "fit", "sponza", "pod"}


def test_build_scene_names():
    for name in ("cornell",):
        cfg = get_config(name)
        s = build_scene(cfg)
        assert s.n_lights > 0


def test_sponza_config_renders_cpu_smoke():
    """Config-4 pipeline smoke on CPU: textured path tracing over a
    (shrunken) Sponza-class scene through the BVH backend."""
    from blink.render.api import render

    cfg = get_config("sponza").override(
        width=24, height=24, spp=1, max_depth=2, sponza_tris=8_000,
        backend="bvh", deterministic=True,
    )
    s = build_scene(cfg)
    assert s.textures.shape[0] == 2  # textured BRDFs present
    img = np.asarray(render(s, cfg))
    assert np.isfinite(img).all() and img.max() > 0.01

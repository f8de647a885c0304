"""Pallas kernel parity vs the pure-JAX traversal, run in interpreter mode
on CPU (SURVEY.md §4.3, §5 "race detection" analog: interpret=True shakes
out out-of-bounds indexing before Mosaic compilation). On-chip parity lives
in tests/tpu/test_pallas_parity.py."""
import pytest
import jax.numpy as jnp
import numpy as np

from blink.bvh import build_flat_bvh
from blink.kernels.traverse import traverse_anyhit, traverse_closest
from blink.kernels.traverse_pallas import (
    pack_bvh_planes,
    traverse_anyhit_pallas,
    traverse_closest_pallas,
)
from tests.test_bvh import _random_rays, _random_tris


@pytest.mark.smoke
def test_closest_parity_interpret():
    for seed, ntri in [(0, 64), (1, 700)]:
        tris = _random_tris(ntri, seed)
        bvh = build_flat_bvh(tris)
        planes = pack_bvh_planes(bvh)
        o, d = _random_rays(300, seed + 20)  # non-multiple of packet size
        t_ref, p_ref = traverse_closest(o, d, bvh)
        for variant in ("ordered", "ordered_rg"):
            t_pl, p_pl = traverse_closest_pallas(
                o, d, planes, interpret=True, variant=variant
            )
            np.testing.assert_allclose(
                np.asarray(t_pl), np.asarray(t_ref), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(p_pl), np.asarray(p_ref))


def test_anyhit_parity_interpret():
    tris = _random_tris(300, 5)
    bvh = build_flat_bvh(tris)
    planes = pack_bvh_planes(bvh)
    o, d = _random_rays(300, 6)
    t_far = jnp.full((300,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_pl = traverse_anyhit_pallas(o, d, planes, t_far, interpret=True)
    np.testing.assert_array_equal(np.asarray(b_pl), np.asarray(b_ref))


def test_wide_parity_interpret():
    """8-wide SMEM-node kernel (bvh.wide + _make_kernel_wide) == reference,
    closest and anyhit, chunked."""
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )

    tris = _random_tris(1600, 11)
    chunks = build_chunked_wide(tris, chunk_tris=800)
    assert len(chunks) == 2
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(300, 12)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_w, p_w = traverse_closest_wide(o, d, chunks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(t_w), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_ref))
    t_far = jnp.full((300,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_w = traverse_anyhit_wide(o, d, chunks, t_far, interpret=True)
    np.testing.assert_array_equal(np.asarray(b_w), np.asarray(b_ref))


def test_wide_packet_shape_parity_interpret():
    """Packet-shape knobs (rows = packet height, row_groups = leaf-cull
    granularity) must not change results. Tiny scene: the interpreter
    pays the while_loop per packet, so this sweep stays cheap."""
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_closest_wide,
    )

    tris = _random_tris(400, 21)
    chunks = build_chunked_wide(tris)  # single tree
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(120, 22)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    # One non-default shape: interpret-mode cost is dominated by tracing
    # the unrolled kernel body (~minutes per variant), so the sweep lives
    # on-chip (benchmarks/stage_probe2.py) and CI checks one exemplar.
    t_w, p_w = traverse_closest_wide(
        o, d, chunks, interpret=True, rows=8, row_groups=8
    )
    np.testing.assert_allclose(
        np.asarray(t_w), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_ref))


def test_chunked_parity_interpret():
    """Chunked multi-pass traversal == single-tree reference (the path the
    1M-triangle scenes take on TPU), including anyhit."""
    from blink.kernels.traverse_pallas import (
        build_chunked_packed,
        traverse_anyhit_chunked,
        traverse_closest_chunked,
    )

    tris = _random_tris(3000, 11)
    chunks = build_chunked_packed(tris, chunk_tris=1000)
    assert len(chunks) == 3
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(300, 12)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_ch, p_ch = traverse_closest_chunked(o, d, chunks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(t_ch), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_ch), np.asarray(p_ref))
    t_far = jnp.full((300,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_ch = traverse_anyhit_chunked(o, d, chunks, t_far, interpret=True)
    np.testing.assert_array_equal(np.asarray(b_ch), np.asarray(b_ref))


def test_wide_rowgate_parity_interpret():
    """leaf_mode='row' (row-granular gating, 8-tris-in-sublanes batches —
    the union_sim-motivated kernel) == reference, closest and anyhit,
    chunked. One small exemplar: interpret cost is tracing-dominated."""
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )

    tris = _random_tris(900, 31)
    chunks = build_chunked_wide(tris, chunk_tris=450)
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(140, 32)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_w, p_w = traverse_closest_wide(
        o, d, chunks, interpret=True, rows=8, leaf_mode="row"
    )
    np.testing.assert_allclose(
        np.asarray(t_w), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_ref))
    t_far = jnp.full((140,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_w = traverse_anyhit_wide(
        o, d, chunks, t_far, interpret=True, rows=8, leaf_mode="row"
    )
    np.testing.assert_array_equal(np.asarray(b_w), np.asarray(b_ref))


def test_wide_stream_parity_interpret():
    """leaf_mode='stream' (HBM tbat + DMA double buffer, one-visit
    deferred row-granular leaf tests) == reference, closest and anyhit,
    chunked + quantized — the exactness claim of the deferral (rows
    recorded at visit time are a superset at process time; processing
    order equals visit order) checked end-to-end."""
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )

    tris = _random_tris(900, 31)
    chunks = build_chunked_wide(tris, chunk_tris=450, quant=True,
                                row_tables=True)
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(140, 32)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_w, p_w = traverse_closest_wide(
        o, d, chunks, interpret=True, rows=8, leaf_mode="stream"
    )
    np.testing.assert_allclose(
        np.asarray(t_w), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_ref))
    t_far = jnp.full((140,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_w = traverse_anyhit_wide(
        o, d, chunks, t_far, interpret=True, rows=8, leaf_mode="stream"
    )
    np.testing.assert_array_equal(np.asarray(b_w), np.asarray(b_ref))


def test_wide_quant_parity_interpret():
    """Quantized-child WideBVH (u8 boxes + per-node dequant frames,
    bvh.wide._quantize_children) == reference. Quantized boxes are only
    LOOSER (conservative), so hits are identical, not just close."""
    from blink.kernels.traverse_pallas import (
        build_chunked_wide,
        traverse_anyhit_wide,
        traverse_closest_wide,
    )

    tris = _random_tris(1600, 41)
    chunks = build_chunked_wide(
        tris, chunk_tris=800, quant=True, row_tables=False
    )
    assert len(chunks) == 2 and chunks[0].quant
    assert chunks[0].child.dtype == jnp.int32
    bvh = build_flat_bvh(tris)
    o, d = _random_rays(300, 42)
    t_ref, p_ref = traverse_closest(o, d, bvh)
    t_w, p_w = traverse_closest_wide(o, d, chunks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(t_w), np.asarray(t_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_w), np.asarray(p_ref))
    t_far = jnp.full((300,), 5.0, jnp.float32)
    b_ref = traverse_anyhit(o, d, bvh, t_far)
    b_w = traverse_anyhit_wide(o, d, chunks, t_far, interpret=True)
    np.testing.assert_array_equal(np.asarray(b_w), np.asarray(b_ref))


def test_quantize_children_conservative():
    """Property: the exact f32 decode of every quantized child box
    CONTAINS the true box (the invariant that makes quantized traversal
    exact rather than approximate)."""
    from blink.bvh.sah import build_sah_bvh
    from blink.bvh.wide import _quantize_children, build_wide

    tris = _random_tris(1200, 43)
    bvh = build_sah_bvh(tris, 4)
    wide = build_wide(bvh, wide_leaf=16, row_tables=False)
    child = np.asarray(wide.child, np.float32).reshape(-1, 8, 8)
    childq, nbox = _quantize_children(child)
    childq = childq.reshape(-1, 8, 3)
    nbox = nbox.reshape(-1, 8)
    lo = child[:, :, 0:3]
    hi = child[:, :, 3:6]
    filled = ~(
        (child[:, :, 7] == 0) & (child[:, :, 6] == 0) & (lo[..., 0] >= 1e29)
    )
    o = nbox[:, None, 0:3].astype(np.float32)
    s = nbox[:, None, 3:6].astype(np.float32)
    w0 = childq[..., 0]
    w1 = childq[..., 1]
    ql = np.stack(
        [w0 & 255, (w0 >> 8) & 255, (w0 >> 16) & 255], axis=-1
    ).astype(np.float32)
    qh = np.stack(
        [w1 & 255, (w1 >> 8) & 255, (w1 >> 16) & 255], axis=-1
    ).astype(np.float32)
    dlo = (o + ql * s).astype(np.float32)
    dhi = (o + qh * s).astype(np.float32)
    assert (dlo[filled] <= lo[filled]).all()
    assert (dhi[filled] >= hi[filled]).all()
    # cnt/ref round-trip
    cnt = (w0 >> 24) & 127
    np.testing.assert_array_equal(cnt, child[:, :, 7].astype(np.int64))
    np.testing.assert_array_equal(
        childq[..., 2], child[:, :, 6].astype(np.int64)
    )

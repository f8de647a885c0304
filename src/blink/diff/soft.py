"""Soft-visibility gradients for silhouettes (spheres AND meshes).

Fixed-topology differentiation (diff.hitrefine) is exact for shading but
omits visibility-edge (silhouette/coverage) terms, which dominate the
pixel-MSE landscape when optimizing geometry POSITIONS (config 3,
BASELINE.json:9; BASELINE.json:5 "differentiable w.r.t. geometry"). This
module provides the standard remedy — SoftRas-style soft coverage — with
the  hard + (soft - stop_grad(soft))  trick: the IMAGE is the exact hard
render (golden tests unchanged) while the GRADIENT is the soft
estimator's, which contains the silhouette terms.

Spheres (exact-form): the ray-sphere discriminant is a SMOOTH function of
center/radius crossing zero exactly at the silhouette;
alpha = sigmoid(disc / (sigma r^2)).

Meshes (SoftRas-lite, VERDICT r1 #7): per pixel, candidate triangles are
the hit triangles of the pixel and its 4 image neighbors (the only
triangles whose silhouette can cross this pixel at image resolution — a
TPU-friendly O(5) gather instead of SoftRas' O(T) rasterization loop).
Each candidate's coverage is a sigmoid of its smooth barycentric edge
margin min(u, v, 1-u-v); candidates composite front-to-back by plane-hit
t with transmittance weights, so both sides of an edge blend between the
triangle's shading and what its neighbor sees behind it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from blink.core import vec
from blink.diff.hitrefine import HitGeom
from blink.render.integrators import RAY_EPS, nee_direct
from blink.scene.scene import Scene

Array = jnp.ndarray

#: Relative depth tolerance for the conditional opaque background: candidate
#: layers whose plane hits all lie within this fraction of the nearest one
#: are treated as one continuous surface (interior edge / adjacent facets)
#: and composite against an opaque far layer; larger gaps are true
#: silhouette layerings and keep the black background (see _mesh_soft_radiance).
OPAQUE_T_REL = 0.08


def _sphere_soft_terms(o: Array, d: Array, scene: Scene, sigma: float):
    """Per-ray soft coverage of the nearest relevant sphere.

    Returns (alpha, t_star, idx): alpha (N,) differentiable coverage of the
    chosen sphere, t_star (N,) its (pseudo-)hit parameter, idx (N,) i32.
    """
    c = scene.spheres.center  # (S,3)
    r = scene.spheres.radius  # (S,)
    oc = o[:, None, :] - c[None, :, :]  # (N,S,3)
    a = jnp.sum(d * d, axis=-1)[:, None]  # (N,1)
    half_b = jnp.sum(oc * d[:, None, :], axis=-1)  # (N,S)
    cc = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
    disc = half_b * half_b - a * cc  # (N,S), smooth in c and r
    alpha = jax.nn.sigmoid(disc / (sigma * (r * r)[None, :]))

    # Hit parameter: real near-root where disc>0, closest approach else.
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t_hit = jnp.where(disc > 0, (-half_b - sq) / a, -half_b / a)
    # Choose the nearest sphere with non-negligible coverage, in front.
    relevant = (alpha > 1e-3) & (t_hit > RAY_EPS)
    t_sort = jnp.where(relevant, t_hit, 1e30)
    idx = jnp.argmin(t_sort, axis=-1)
    n = o.shape[0]
    rows = jnp.arange(n)
    alpha_sel = jnp.where(relevant[rows, idx], alpha[rows, idx], 0.0)
    return alpha_sel, t_hit[rows, idx], jnp.asarray(idx, jnp.int32)


def _sphere_geom(o: Array, d: Array, scene: Scene, t_star: Array, idx: Array,
                 valid: Array) -> HitGeom:
    """Differentiable shading geometry on sphere `idx` at t_star (real hit
    or closest-approach limit point, projected to the surface)."""
    c = scene.spheres.center[idx]
    r = scene.spheres.radius[idx]
    p_line = o + t_star[:, None] * d
    nrm = vec.normalize(p_line - c)
    p = c + nrm * r[:, None]  # project onto the surface (silhouette limit)
    mat = scene.spheres.material_id[idx]
    albedo = scene.materials.albedo[mat]
    emission = scene.materials.emission[mat]
    vmask = valid[:, None]
    u = 0.5 + jnp.arctan2(nrm[..., 2], nrm[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 + jnp.arcsin(jnp.clip(nrm[..., 1], -1.0, 1.0)) / jnp.pi
    return HitGeom(
        valid=valid,
        t=jnp.where(valid, t_star, 1e30),
        p=jnp.where(vmask, p, 0.0),
        n=jnp.where(vmask, nrm, 0.0),
        uv=jnp.where(vmask, jnp.stack([u, v], -1), 0.0),
        mat=jnp.where(valid, mat, 0),
        albedo=jnp.where(vmask, albedo, 0.0),
        emission=jnp.where(vmask, emission, 0.0),
    )


def _tri_geom(o: Array, d: Array, scene: Scene, prim: Array, t_plane: Array,
              valid: Array) -> HitGeom:
    """Differentiable shading geometry on triangle `prim` at its PLANE hit
    (near-miss rays shade at the just-outside-the-edge limit point —
    the mesh analog of _sphere_geom's closest-approach projection)."""
    from blink.scene.textures import sample_texture

    tris = scene.triangles
    tp = jnp.clip(prim, 0, scene.n_triangles - 1)
    i0, i1, i2 = tris.idx[tp, 0], tris.idx[tp, 1], tris.idx[tp, 2]
    v0 = tris.verts[i0]
    e1 = tris.verts[i1] - v0
    e2 = tris.verts[i2] - v0
    nrm = vec.normalize(vec.cross(e1, e2))
    p = o + t_plane[:, None] * d
    # Barycentrics of the plane point (for uv/texture continuity).
    pvec = vec.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = vec.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    uv = (
        (1.0 - u - v)[:, None] * tris.uv[i0]
        + u[:, None] * tris.uv[i1]
        + v[:, None] * tris.uv[i2]
    )
    flip = jnp.where(vec.vdot(nrm, d) > 0.0, -1.0, 1.0)
    nrm = nrm * flip[:, None]
    mat = tris.material_id[tp]
    albedo = scene.materials.albedo[mat]
    tex = sample_texture(scene.textures, scene.materials.texture_id[mat], uv)
    albedo = albedo * tex
    emission = scene.materials.emission[mat]
    vmask = valid[:, None]
    return HitGeom(
        valid=valid,
        t=jnp.where(valid, t_plane, 1e30),
        p=jnp.where(vmask, p, 0.0),
        n=jnp.where(vmask, nrm, 0.0),
        uv=jnp.where(vmask, uv, 0.0),
        mat=jnp.where(valid, mat, 0),
        albedo=jnp.where(vmask, albedo, 0.0),
        emission=jnp.where(vmask, emission, 0.0),
    )


def _mesh_soft_radiance(
    o: Array, d: Array, keys: Array, scene: Scene, backend,
    deterministic: bool, sigma: float, hw: tuple[int, int], hit,
    residual_radiance: Array | None = None,
    opaque_last: bool = True,
) -> Array:
    """SoftRas-lite soft radiance over neighbor-candidate triangles.

    hit: the hard topology (backend.intersect output, already computed by
    the hard pass). Rays MUST be in row-major (h, w) pixel order. `sigma`
    is the silhouette band half-width in PIXELS (~0.5-1.5).

    residual_radiance: what LEFTOVER transmittance sees after all
    candidate layers — pass the ray's HARD radiance. With a black
    residual (None), INTERIOR mesh edges (coplanar triangle pairs, e.g.
    a quad's diagonal) leave (1-a_A)(1-a_B) ~ 25% of the pixel seeing
    black: a phantom dark seam whose position moves with camera/geometry,
    injecting phantom visibility flux along every interior edge (measured:
    cam_look_at soft-AD -89 vs FD 0.21 on the Cornell scene). With the
    hard radiance as residual, interior edges reconstruct exactly
    (a*L + (1-a)*L = L) while true silhouettes are unaffected (their
    behind-layer candidate already absorbs the transmittance)."""
    from blink.kernels.types import KIND_TRI

    h, w = hw
    n = o.shape[0]
    # Vertical pixel angle (pinhole): 2 tan(fov/2) / h. stop_gradient: the
    # footprint is a SCALE, not a differentiation surface (camera-fov
    # gradients flow through the hard estimator's shading terms).
    pix_ang = jax.lax.stop_gradient(
        2.0 * jnp.tan(jnp.deg2rad(scene.camera.fov_deg) * 0.5) / h
    )
    prim = jnp.where(hit.kind == KIND_TRI, hit.prim, -1)
    pimg = prim.reshape(h, w)
    # Candidates: own hit + 4-neighborhood hits (dedup'd left-to-right).
    cands = [
        pimg,
        jnp.roll(pimg, 1, axis=0),
        jnp.roll(pimg, -1, axis=0),
        jnp.roll(pimg, 1, axis=1),
        jnp.roll(pimg, -1, axis=1),
    ]
    cands = [c.reshape(n) for c in cands]
    dedup = [cands[0]]
    for c in cands[1:]:
        dup = jnp.zeros((n,), bool)
        for seen in dedup:
            dup = dup | (c == seen)
        dedup.append(jnp.where(dup, -1, c))
    tris = scene.triangles

    alphas, ts, prims = [], [], []
    for c in dedup:
        cp = jnp.clip(c, 0, scene.n_triangles - 1)
        i0, i1, i2 = tris.idx[cp, 0], tris.idx[cp, 1], tris.idx[cp, 2]
        v0 = tris.verts[i0]
        e1 = tris.verts[i1] - v0
        e2 = tris.verts[i2] - v0
        # Raw (uncut) Möller–Trumbore: smooth plane hit + barycentrics.
        pvec = vec.cross(d, e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        degenerate = det == 0.0
        inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
        tvec = o - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = vec.cross(tvec, e1)
        v = jnp.sum(d * qvec, axis=-1) * inv_det
        t_pl = jnp.sum(e2 * qvec, axis=-1) * inv_det
        # Signed edge distance in WORLD units (bary * opposite-edge
        # height), then normalized by the PIXEL FOOTPRINT at the hit
        # distance (t * pixel angle): the sigmoid band is `sigma` PIXELS
        # wide in screen space regardless of triangle size or distance.
        # A scale-free bary margin (first attempt) leaves interior
        # coverage unsaturated for small triangles — the parasitic
        # interior-coverage gradients then drown the silhouette signal
        # (measured: soft loss landscape descends toward the truth while
        # its local AD slope points the other way).
        n2 = vec.cross(e1, e2)
        area2 = jnp.sqrt(jnp.maximum(jnp.sum(n2 * n2, axis=-1), 1e-20))
        h_u = area2 / jnp.maximum(jnp.linalg.norm(e2, axis=-1), 1e-10)
        h_v = area2 / jnp.maximum(jnp.linalg.norm(e1, axis=-1), 1e-10)
        h_w = area2 / jnp.maximum(
            jnp.linalg.norm(e2 - e1, axis=-1), 1e-10
        )
        d_world = jnp.minimum(
            jnp.minimum(u * h_u, v * h_v), (1.0 - u - v) * h_w
        )
        footprint = jnp.maximum(t_pl, RAY_EPS) * pix_ang
        alpha = jax.nn.sigmoid(d_world / (sigma * footprint))
        ok = (c >= 0) & ~degenerate & (t_pl > RAY_EPS)
        alphas.append(jnp.where(ok, alpha, 0.0))
        ts.append(jnp.where(ok, t_pl, 1e30))
        prims.append(c)
    A = jnp.stack(alphas, axis=1)  # (N, 5)
    T = jnp.stack(ts, axis=1)
    Pr = jnp.stack(prims, axis=1)
    order = jnp.argsort(T, axis=1)  # front-to-back
    rows = jnp.arange(n)[:, None]
    A = A[rows, order]
    T = T[rows, order]
    Pr = Pr[rows, order]
    if opaque_last:
        # CONDITIONAL opaque background: when every valid candidate lies
        # on (nearly) the same depth — the coplanar/adjacent-facet case
        # whose leftover transmittance created the interior-edge phantom
        # seam (34fb0fb's motivation) — force the furthest valid layer
        # opaque so the pixel reconstructs exactly (a*L + (1-a)*L = L,
        # zero phantom flux). TRUE silhouettes (large depth gap between
        # candidate layers, or a single candidate against the void) keep
        # the black background: their partial-coverage response is the
        # SoftRas translation signal, and measurably removing it flips
        # mesh-offset recovery from converging to diverging
        # (benchmarks/soft_regress_probe{,3}.py: residual=hard,
        # residual=sg(hard) and unconditional opaque-last ALL diverge
        # 0.058 -> ~0.6 while black-background converges to 0.007; the
        # unconditional forms fix the camera ratio instead).
        valid = T < 1e29
        nvalid = jnp.sum(valid.astype(jnp.int32), axis=1)
        kidx = jnp.arange(len(dedup))[None, :]
        is_last = (kidx == (nvalid - 1)[:, None]) & valid
        t_first = T[:, 0]
        t_last = jnp.sum(jnp.where(is_last, T, 0.0), axis=1)
        coplanar = (nvalid > 1) & (
            t_last <= t_first * (1.0 + OPAQUE_T_REL) + RAY_EPS
        )
        A = jnp.where(is_last & coplanar[:, None], 1.0, A)

    soft = jnp.zeros((n, 3), A.dtype)
    trans = jnp.ones((n,), A.dtype)
    for k in range(len(dedup)):
        geom = _tri_geom(
            o, d, scene, Pr[:, k], T[:, k], (A[:, k] > 0.0) & (T[:, k] < 1e29)
        )
        l_k = geom.emission + nee_direct(
            scene, geom, keys, backend, bounce=0, deterministic=deterministic
        )
        wgt = trans * A[:, k]
        soft = soft + wgt[:, None] * l_k
        trans = trans * (1.0 - A[:, k])
    if residual_radiance is not None:
        soft = soft + trans[:, None] * residual_radiance
    return soft  # else: residual transmittance sees the black environment


def li_direct_soft(
    o: Array,
    d: Array,
    keys: Array,
    scene: Scene,
    backend,
    deterministic: bool,
    sigma: float,
    hw: tuple[int, int] | None = None,
) -> Array:
    """Direct-lighting radiance with soft-silhouette gradients.

    Forward value == li_direct exactly (hard + soft - stop_grad(soft));
    backward flows through the soft coverage blends. Sphere silhouettes
    always; mesh silhouettes when `hw` gives the image shape (rays in
    row-major pixel order — the non-permuted render path)."""
    from blink.render.integrators import li_direct
    from blink.scene.scene import empty_spheres

    hard = li_direct(o, d, keys, scene, backend, deterministic)
    out = hard
    if scene.n_spheres > 0:
        # Background: the scene without spheres (triangles only).
        scene_bg = scene.replace(spheres=empty_spheres())
        l_bg = li_direct(o, d, keys, scene_bg, backend, deterministic)

        alpha, t_star, idx = _sphere_soft_terms(o, d, scene, sigma)
        geom = _sphere_geom(o, d, scene, t_star, idx, alpha > 0.0)
        l_sph = geom.emission + nee_direct(
            scene, geom, keys, backend, bounce=0, deterministic=deterministic
        )
        soft = alpha[:, None] * l_sph + (1.0 - alpha[:, None]) * l_bg
        out = out + (soft - jax.lax.stop_gradient(soft))
    if hw is not None and scene.n_triangles > 0:
        # The mesh-soft term is a GEOMETRY-gradient estimator (tri_verts
        # silhouettes). Camera parameters are stop-gradiented out of it:
        # camera-visibility flux through the candidate blends measurably
        # explodes (soft cam AD -89 vs FD 0.21, the 34fb0fb incident) and
        # every weight-renormalizing remedy (hard residual, sg residual,
        # opaque far layer, coplanar-gated opaque) flips mesh-offset
        # recovery from converging to diverging instead — see
        # benchmarks/soft_regress_probe{,2,3}.py for the A/B record.
        # Camera pose/fov gradients flow through the hard estimator's
        # shading terms and the sphere-soft term (tests
        # test_fit_recovers_camera_look_at / _sane), which keeps both
        # capabilities green with ONE estimator.
        o_m = jax.lax.stop_gradient(o)
        d_m = jax.lax.stop_gradient(d)
        hit = backend.intersect(o_m, d_m, scene)
        soft_m = _mesh_soft_radiance(
            o_m, d_m, keys, scene, backend, deterministic, sigma, hw, hit,
            residual_radiance=None, opaque_last=False,
        )
        out = out + (soft_m - jax.lax.stop_gradient(soft_m))
    return out
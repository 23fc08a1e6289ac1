"""Edge-aware (boundary) visibility gradients.

The interior (detached-sampling) gradients the integrator produces are
exact for everything that varies smoothly — material albedo, hit
distances, normals — but identically zero for VISIBILITY: moving a
vertex so a silhouette sweeps across a pixel changes the image
discontinuously, and autodiff through a discontinuity reports 0. The
missing term is the boundary integral of differentiable rendering
(Li et al. 2018 edge sampling / Reynolds transport):

    dI_p/dtheta = interior + sum_{silhouette edges} INT_edge
                  (L_minus - L_plus)(x) * (d x_screen/dtheta . n_hat) dl

where n_hat is the screen-space edge normal and L_minus/L_plus the
radiance just on either side. This module estimates that term by
Monte-Carlo edge sampling:

1. collect unique mesh edges + their adjacent faces (host, once);
2. per camera: mark SILHOUETTE edges (adjacent faces straddle the view
   direction — with back-face culling any front/back or front/none
   transition is a visibility boundary);
3. sample points on silhouette edges, project to screen, drop occluded
   samples (a camera ray to the point must reach it);
4. evaluate radiance on ray pairs nudged +/-delta pixels across the
   projected edge, with COMMON random numbers so the pair's noise
   cancels in the difference;
5. contribution per sample: (L_minus - L_plus) . cot[pixel] *
   d(screen position . n_hat)/dtheta * (projected edge length / K).

Scope: primary-visibility silhouettes (camera edges) AND
secondary-bounce boundaries (shadow / indirect-visibility edges seen
from diffuse first-hit points — :func:`boundary_secondary_grad`,
enabled via ``make_render_geo(..., secondary_viewpoints=M)``).
Gradients w.r.t. mesh vertex positions and camera position/look_at.
Analytic-geometry (cube/sphere) silhouettes and boundaries seen from
specular chains are not sampled — documented divergence from a full
Li-style estimator.

The reference renderer is forward-only CUDA; this subsystem has no
counterpart there (BASELINE.json north star: "reparameterized /
edge-aware gradients").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.camera import RaySoA
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG


class MeshEdges(NamedTuple):
    """Unique undirected edges of an indexed triangle mesh (host)."""

    va: np.ndarray  # [E] int32 vertex index
    vb: np.ndarray  # [E] int32
    fa: np.ndarray  # [E] int32 adjacent face
    fb: np.ndarray  # [E] int32 second face or -1 (boundary edge)


def build_edges(faces: np.ndarray) -> MeshEdges:
    """Extract unique edges + adjacency from [F, 3] vertex indices."""
    faces = np.asarray(faces, np.int64)
    f_ids = np.repeat(np.arange(faces.shape[0]), 3)
    ea = faces[:, [0, 1, 2]].ravel()
    eb = faces[:, [1, 2, 0]].ravel()
    lo, hi = np.minimum(ea, eb), np.maximum(ea, eb)
    key = lo << 32 | hi
    order = np.argsort(key, kind="stable")
    key_s, f_s = key[order], f_ids[order]
    uniq, start = np.unique(key_s, return_index=True)
    counts = np.diff(np.append(start, key_s.shape[0]))
    fa = f_s[start]
    fb = np.full(uniq.shape[0], -1, np.int64)
    two = counts >= 2
    fb[two] = f_s[start[two] + 1]
    return MeshEdges(
        va=(uniq >> 32).astype(np.int32),
        vb=(uniq & 0xFFFFFFFF).astype(np.int32),
        fa=fa.astype(np.int32),
        fb=fb.astype(np.int32),
    )


def project_to_screen(camera, X):
    """World point(s) [.., 3] -> continuous screen coords (sx, sy), the
    exact inverse of generate_rays' pixel->direction mapping (a ray for
    integer pixel (x, y) projects back to sx == x, sy == y)."""
    pos = jnp.asarray(camera.position)
    view = jnp.asarray(camera.view)
    right = jnp.asarray(camera.right)
    up = jnp.asarray(camera.up)
    pl = jnp.asarray(camera.pixel_length)
    res_x = int(camera.resolution[0])
    res_y = int(camera.resolution[1])
    w = X - pos
    depth = jnp.einsum("...k,k->...", w, view)
    safe = jnp.where(depth > 1e-6, depth, 1.0)
    sx = jnp.einsum("...k,k->...", w, right) / (safe * pl[0]) + res_x * 0.5
    sy = -jnp.einsum("...k,k->...", w, up) / (safe * pl[1]) + res_y * 0.5
    return sx, sy, depth


def _face_normals(verts, faces):
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    return jnp.cross(e1, e2), v0  # un-normalized; MT's det sign matches


def silhouette_mask(verts, faces, edges: MeshEdges, cam_pos):
    """[E] bool: edge is a primary-visibility silhouette. With back-face
    culling (MT det > 0 only), a visibility boundary is any edge whose
    two faces differ in front-facing-ness, or a boundary edge whose one
    face is front-facing."""
    fn, v0 = _face_normals(verts, faces)
    # front-facing iff the camera sees the CCW side: dot(n, cam - v0) > 0
    front = jnp.einsum("fk,fk->f", fn, cam_pos[None, :] - v0) > 0
    fa_front = front[edges.fa]
    has_b = edges.fb >= 0
    fb_front = jnp.where(has_b, front[jnp.maximum(edges.fb, 0)], False)
    return jnp.where(has_b, fa_front != fb_front, fa_front)


def boundary_image_grad(
    verts,
    faces,
    edges: MeshEdges,
    scene_arrays,  # (geoms, materials, mesh_traced, kd_traced)
    camera,
    config: RenderConfig,
    base_key,
    iteration,
    cot_image,  # [N_pixels, 3] cotangent of the radiance image
    samples_per_edge: int = 4,
    delta: float = 0.3,  # half-gap between the L+/L- probe rays, pixels
):
    """Monte-Carlo boundary term -> (d_verts [V,3], d_cam_pos [3]).

    Differentiates ONLY the edge-point screen motion (step 5 in the
    module docstring); radiances, silhouette classification, pixel
    assignment and occlusion tests are all detached, as the estimator
    prescribes.
    """
    from kdtreepathtraceroptimization_tpu.render.integrator import (
        intersect_scene, trace_rays,
    )

    geoms, materials, mesh_t, kd_t = scene_arrays
    res_x = int(camera.resolution[0])
    res_y = int(camera.resolution[1])
    E = edges.va.shape[0]
    K = samples_per_edge
    va = jnp.asarray(edges.va)
    vb = jnp.asarray(edges.vb)
    cam_pos = jnp.asarray(camera.position)

    sil = silhouette_mask(verts, faces, edges, cam_pos)

    # --- sample points on every edge (dead ones masked, static shapes)
    s = (jnp.arange(K, dtype=jnp.float32)[None, :] + 0.5) / K  # stratified
    A = verts[va]  # [E, 3]
    B = verts[vb]
    X = A[:, None, :] * (1.0 - s)[..., None] + B[:, None, :] * s[..., None]
    sx, sy, depth = project_to_screen(camera, X)

    # screen-space edge direction & normal (detached)
    ax, ay, _ = project_to_screen(camera, A)
    bx, by, _ = project_to_screen(camera, B)
    ex, ey = bx - ax, by - ay
    elen = jnp.sqrt(ex * ex + ey * ey) + 1e-12
    # n_hat perpendicular to the projected edge
    nx, ny = -ey / elen, ex / elen  # [E]
    nx_d = jax.lax.stop_gradient(nx)[:, None]
    ny_d = jax.lax.stop_gradient(ny)[:, None]

    in_frustum = (
        (depth > 1e-4)
        & (sx > 0.5) & (sx < res_x - 0.5)
        & (sy > 0.5) & (sy < res_y - 0.5)
    )
    alive = sil[:, None] & in_frustum  # [E, K]

    # --- occlusion: a camera ray toward X must reach it
    Xd = jax.lax.stop_gradient(X).reshape(-1, 3)
    to_x = Xd - cam_pos[None, :]
    dist = vm.safe_norm(to_x)
    dirs = to_x / dist[:, None]
    occ_hit = intersect_scene(
        jnp.broadcast_to(cam_pos, Xd.shape), dirs, geoms, materials,
        mesh_t, kd_t, config, active=alive.reshape(-1),
    )
    visible = occ_hit.t >= dist * (1.0 - 1e-3)
    alive = alive & visible.reshape(E, K)

    # --- radiance probes straddling the edge (common random numbers)
    sxd = jax.lax.stop_gradient(sx)
    syd = jax.lax.stop_gradient(sy)
    pix_x = jnp.clip(jnp.round(sxd).astype(jnp.int32), 0, res_x - 1)
    pix_y = jnp.clip(jnp.round(syd).astype(jnp.int32), 0, res_y - 1)
    pixel = (pix_y * res_x + pix_x).reshape(-1)

    view = jnp.asarray(camera.view)
    right = jnp.asarray(camera.right)
    up = jnp.asarray(camera.up)
    pl = jnp.asarray(camera.pixel_length)

    def probe_rays(sign):
        qx = sxd + sign * delta * nx_d
        qy = syd + sign * delta * ny_d
        d = vm.normalize(
            view[None, :]
            + right[None, :] * (pl[0] * (qx.reshape(-1) - res_x * 0.5))[:, None]
            - up[None, :] * (pl[1] * (qy.reshape(-1) - res_y * 0.5))[:, None]
        )
        n = d.shape[0]
        return RaySoA(
            origin=vm.v3_from_rows(jnp.broadcast_to(cam_pos[None, :], (n, 3))),
            direction=vm.v3_from_rows(d),
            color=vm.V3(jnp.ones((n,), jnp.float32),
                        jnp.ones((n,), jnp.float32),
                        jnp.ones((n,), jnp.float32)),
            is_inside=jnp.zeros((n,), jnp.bool_),
            sdepth=jnp.zeros((n,), jnp.float32),
            pixel_index=pixel,  # same stream for both sides: CRN
            remaining_bounces=jnp.full((n,), config.effective_depth, jnp.int32),
        )

    def radiance(rays):
        return jax.lax.stop_gradient(
            trace_rays(rays, geoms, materials, mesh_t, kd_t, config,
                       base_key, iteration)
        )

    L_plus = radiance(probe_rays(+1.0)).reshape(E, K, 3)
    L_minus = radiance(probe_rays(-1.0)).reshape(E, K, 3)

    cot = cot_image[pixel].reshape(E, K, 3)
    # weight per sample: (L- − L+).cot × screen length/K   [E, K]
    w = jnp.where(
        alive[..., None], (L_minus - L_plus) * cot, 0.0
    ).sum(-1) * (jax.lax.stop_gradient(elen) / K)[:, None]

    # --- differentiate screen motion along n_hat
    def edge_screen_dot(verts_in, cam_pos_in):
        A = verts_in[va]
        B = verts_in[vb]
        X = A[:, None, :] * (1.0 - s)[..., None] + B[:, None, :] * s[..., None]
        sx, sy, _ = project_to_screen(
            camera._replace(position=cam_pos_in), X
        )
        return jnp.sum((sx * nx_d + sy * ny_d) * w)

    d_verts, d_cam = jax.grad(edge_screen_dot, argnums=(0, 1))(verts, cam_pos)
    return d_verts, d_cam


def boundary_secondary_grad(
    verts,
    faces,
    edges: MeshEdges,
    scene_arrays,  # (geoms, materials, mesh_traced, kd_traced)
    camera,
    config: RenderConfig,
    base_key,
    iteration,
    cot_image,  # [N_pixels, 3] cotangent of the radiance image
    n_view: int = 1024,
    samples_per_edge: int = 2,
    delta: float = 0.02,
) -> jax.Array:
    """Secondary-bounce boundary term -> d_verts [V, 3].

    For a pixel whose camera ray first hits a DIFFUSE surface at y, the
    pixel value is I_p = albedo * INT L_i(y, w) cos(w)/pi dw (the
    integrator's cosine sampling makes the pdf cancel exactly). Moving
    a mesh vertex sweeps the mesh's silhouette AS SEEN FROM y across
    direction space — a visibility discontinuity of L_i that interior
    autodiff and the primary (camera-edge) estimator both report as
    zero. This is the missing term for shadow and indirect-visibility
    edges.

    Estimator (the direction-sphere analogue of boundary_image_grad):

    1. viewpoints: first hits of a stratified subset of M central
       camera rays; only diffuse non-emissive hits contribute (specular
       chains are out of scope — module docstring).
    2. per (viewpoint, edge): silhouette = adjacent faces straddle y.
    3. per edge sample X: w = dir(y -> X); drop samples occluded from y
       or below the horizon. Crossing direction n_hat =
       normalize(cross(w, B - A)) (tangent-plane normal of the
       projected edge curve).
    4. radiance probes L+- = trace_rays(y, normalize(w +- delta*n_hat))
       at depth-1 with COMMON random numbers (pixel-keyed streams).
    5. weight per sample: (L- - L+) . (cot[pixel] * albedo) * cos(w)/pi
       * (projected edge arc length / K); gradient = d/dtheta of
       sum(w_s * (w(X(theta), y) . n_hat_detached)) — only the edge
       point's direction-space motion is differentiated, everything
       else (viewpoint, radiances, classification) is detached, as the
       estimator prescribes.

    Viewpoints are an M-pixel stratified subsample weighted by N/M, so
    the term is an unbiased Monte-Carlo estimate of the sum over all
    pixels; M = the full pixel count makes the pixel sum exact.
    """
    from kdtreepathtraceroptimization_tpu.ops import bsdf as bsdf_ops
    from kdtreepathtraceroptimization_tpu.render.integrator import (
        intersect_scene, trace_rays,
    )

    geoms, materials, mesh_t, kd_t = scene_arrays
    res_x = int(camera.resolution[0])
    res_y = int(camera.resolution[1])
    n_pix = res_x * res_y
    E = edges.va.shape[0]
    K = samples_per_edge
    M = min(n_view, n_pix)
    va = jnp.asarray(edges.va)
    vb = jnp.asarray(edges.vb)
    cam_pos = jnp.asarray(camera.position)
    view = jnp.asarray(camera.view)
    right = jnp.asarray(camera.right)
    up = jnp.asarray(camera.up)
    pl = jnp.asarray(camera.pixel_length)

    # --- 1. viewpoints: stratified pixel lattice, central rays --------
    stride = n_pix / M
    off = jax.random.uniform(jax.random.fold_in(base_key, 0x5EC0), ())
    pixel = jnp.clip(
        ((jnp.arange(M, dtype=jnp.float32) + off) * stride).astype(jnp.int32),
        0, n_pix - 1,
    )
    px = (pixel % res_x).astype(jnp.float32)
    py = (pixel // res_x).astype(jnp.float32)
    vdir = vm.normalize(
        view[None, :]
        + right[None, :] * (pl[0] * (px - res_x * 0.5))[:, None]
        - up[None, :] * (pl[1] * (py - res_y * 0.5))[:, None]
    )
    vhit = intersect_scene(
        jnp.broadcast_to(cam_pos, (M, 3)), vdir, geoms, materials,
        mesh_t, kd_t, config,
    )
    vmat = bsdf_ops.gather_materials(materials, vhit.material_id)
    is_diffuse = (
        (vhit.t < BIG)
        & (vmat.emittance <= 0.0)
        & (vmat.has_reflective <= 0.0)
        & (vmat.has_refractive <= 0.0)
    )
    y = jax.lax.stop_gradient(vm.v3_to_rows(vhit.point))     # [M, 3]
    nrm_y = jax.lax.stop_gradient(vm.v3_to_rows(vhit.normal))
    albedo = jax.lax.stop_gradient(vm.v3_to_rows(vmat.color))  # [M, 3]

    # --- 2. silhouette per (viewpoint, edge) --------------------------
    fn, v0f = _face_normals(jax.lax.stop_gradient(verts), faces)
    # front[m, f] = face f faces viewpoint m
    front = jnp.einsum("fk,mfk->mf", fn, y[:, None, :] - v0f[None, :, :]) > 0
    fa_front = front[:, edges.fa]                            # [M, E]
    has_b = (edges.fb >= 0)[None, :]
    fb_front = jnp.where(has_b, front[:, jnp.maximum(edges.fb, 0)], False)
    sil = jnp.where(has_b, fa_front != fb_front, fa_front)   # [M, E]

    # --- 3. edge samples + geometry -----------------------------------
    s = (jnp.arange(K, dtype=jnp.float32)[None, :] + 0.5) / K
    A = verts[va]                                            # [E, 3]
    B = verts[vb]
    X = A[:, None, :] * (1.0 - s)[..., None] + B[:, None, :] * s[..., None]
    Xd = jax.lax.stop_gradient(X)                            # [E, K, 3]
    eAB = jax.lax.stop_gradient(B - A)                       # [E, 3]

    to_x = Xd[None, :, :, :] - y[:, None, None, :]           # [M, E, K, 3]
    dist = vm.safe_norm(to_x.reshape(-1, 3)).reshape(M, E, K)
    w_dir = to_x / dist[..., None]
    cosw = jnp.einsum("mekc,mc->mek", w_dir, nrm_y)
    # crossing direction (already unit-orthogonal to w)
    n_hat = jnp.cross(w_dir, jnp.broadcast_to(
        eAB[None, :, None, :], w_dir.shape))
    n_len = vm.safe_norm(n_hat.reshape(-1, 3)).reshape(M, E, K)
    n_hat = n_hat / n_len[..., None]
    n_hat = jax.lax.stop_gradient(n_hat)
    # projected arc length of the edge at this sample, per unit t:
    # |P_perp(B - A)| / dist; P_perp(e) = e - (e.w)w and |w x e| is
    # exactly |P_perp(e)|.
    arc = n_len / jnp.maximum(dist, 1e-6)                    # [M, E, K]

    alive = sil[:, :, None] & (cosw > 1e-4) & is_diffuse[:, None, None]

    # --- occlusion: the edge point must be visible from y -------------
    origin_probe = y + nrm_y * 1e-4                          # scatter's eps
    R = M * E * K
    occ = intersect_scene(
        jnp.broadcast_to(origin_probe[:, None, None, :], (M, E, K, 3)
                         ).reshape(R, 3),
        w_dir.reshape(R, 3), geoms, materials, mesh_t, kd_t, config,
        active=alive.reshape(R),
    )
    visible = occ.t.reshape(M, E, K) >= dist * (1.0 - 1e-3)
    alive = alive & visible

    # --- 4. radiance probes (CRN via pixel-keyed streams) -------------
    pix_rep = jnp.broadcast_to(pixel[:, None, None], (M, E, K)).reshape(R)

    def probe(sign):
        d = vm.normalize(
            (w_dir + sign * delta * n_hat).reshape(R, 3))
        rays = RaySoA(
            origin=vm.v3_from_rows(jnp.broadcast_to(
                origin_probe[:, None, None, :], (M, E, K, 3)).reshape(R, 3)),
            direction=vm.v3_from_rows(d),
            color=vm.V3(jnp.ones((R,), jnp.float32),
                        jnp.ones((R,), jnp.float32),
                        jnp.ones((R,), jnp.float32)),
            is_inside=jnp.zeros((R,), jnp.bool_),
            sdepth=jnp.zeros((R,), jnp.float32),
            pixel_index=pix_rep,  # same stream both sides: CRN
            remaining_bounces=jnp.where(
                alive.reshape(R),
                jnp.full((R,), max(1, config.effective_depth - 1),
                         jnp.int32),
                0,
            ),
        )
        return jax.lax.stop_gradient(
            trace_rays(rays, geoms, materials, mesh_t, kd_t, config,
                       base_key, iteration)
        ).reshape(M, E, K, 3)

    L_plus = probe(+1.0)
    L_minus = probe(-1.0)

    cot = cot_image[pixel]                                   # [M, 3]
    wgt = jnp.where(
        alive[..., None],
        (L_minus - L_plus) * (cot * albedo)[:, None, None, :],
        0.0,
    ).sum(-1)
    inv_pi = 1.0 / jnp.pi
    wgt = wgt * jnp.maximum(cosw, 0.0) * inv_pi * arc / K
    wgt = jax.lax.stop_gradient(wgt) * (n_pix / M)           # [M, E, K]

    # --- 5. differentiate the direction-space motion ------------------
    def edge_dir_dot(verts_in):
        A = verts_in[va]
        B = verts_in[vb]
        X = (A[:, None, :] * (1.0 - s)[..., None]
             + B[:, None, :] * s[..., None])                 # [E, K, 3]
        to_x = X[None, :, :, :] - y[:, None, None, :]
        w = to_x / vm.safe_norm(to_x.reshape(-1, 3)).reshape(M, E, K)[..., None]
        return jnp.sum(jnp.einsum("mekc,mekc->mek", w, n_hat) * wgt)

    return jax.grad(edge_dir_dot)(verts)


def retris(kd, verts, faces):
    """Re-express the KD leaf triangle arrays as traced gathers of the
    SOURCE vertex array, so interior gradients flow to vertices while
    the tree topology stays fixed (detached-sampling convention)."""
    orig = jnp.asarray(kd.tris.orig_index)
    ok = orig >= 0
    o = jnp.maximum(orig, 0)
    f = jnp.asarray(faces)

    def take(c):
        v = verts[f[o, c]]
        return jnp.where(ok[:, None], v, 0.0)

    tris = kd.tris._replace(v0=take(0), v1=take(1), v2=take(2))
    # fat-row inline triangle slots must follow the same vertices
    fat = None
    if kd.fat is not None:
        cap = kd.fat.inline_cap
        rows = jnp.asarray(kd.fat.rows)
        tri9 = jnp.concatenate([tris.v0, tris.v1, tris.v2], axis=1)  # [T,9]
        chunk = tri9.reshape(-1, cap, 9).transpose(0, 2, 1).reshape(-1, 9 * cap)
        tri_base = rows[:, 10].astype(jnp.int32)
        has = tri_base >= 0
        blk = chunk[jnp.clip(tri_base // cap, 0, chunk.shape[0] - 1)]
        inline = jnp.where(has[:, None], blk, rows[:, 12:])
        fat = kd.fat._replace(rows=jnp.concatenate([rows[:, :12], inline], axis=1))
    return kd._replace(tris=tris, fat=fat, oct=None)


def make_render_geo(scene, verts0, faces, config: RenderConfig,
                    samples_per_edge: int = 4, delta: float = 0.3,
                    secondary_viewpoints: int = 0,
                    secondary_delta: float = 0.02):
    """Build ``render_geo(verts, cam_pos, key, iteration) -> image`` whose
    VJP = interior autodiff + the edge-sampled boundary term.

    ``secondary_viewpoints`` > 0 additionally samples SECONDARY
    visibility boundaries (shadow / indirect edges seen from that many
    diffuse first-hit viewpoints — :func:`boundary_secondary_grad`);
    0 keeps the round-3 primary-only estimator.

    The KD topology is built once from ``verts0`` and kept fixed; vertex
    motion large enough to invalidate it requires a rebuild (standard
    detached-topology convention in differentiable ray tracers).
    """
    edges = build_edges(np.asarray(faces))
    faces_j = jnp.asarray(np.asarray(faces, np.int32))
    geoms, materials, camera = scene.geoms, scene.materials, scene.camera

    def primal(verts, cam_pos, key, iteration):
        from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
        from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
        from kdtreepathtraceroptimization_tpu.render.integrator import trace_rays

        kd_t = retris(scene.kd, verts, faces_j)
        mesh_t = scene.mesh._replace(
            v0=verts[faces_j[:, 0]], v1=verts[faces_j[:, 1]], v2=verts[faces_j[:, 2]]
        )
        cam = camera._replace(position=cam_pos)
        rays = generate_rays(cam, config, bounce_key(key, iteration, 0),
                             config.effective_depth)
        return trace_rays(rays, geoms, materials, mesh_t, kd_t, config,
                          key, iteration)

    @jax.custom_vjp
    def render_geo(verts, cam_pos, key, iteration):
        return primal(verts, cam_pos, key, iteration)

    def fwd(verts, cam_pos, key, iteration):
        img, interior_vjp = jax.vjp(
            lambda v, c: primal(v, c, key, iteration), verts, cam_pos
        )
        return img, (verts, cam_pos, key, iteration, interior_vjp)

    def bwd(res, cot):
        verts, cam_pos, key, iteration, interior_vjp = res
        d_verts, d_cam = interior_vjp(cot)
        kd_t = retris(scene.kd, jax.lax.stop_gradient(verts), faces_j)
        mesh_t = scene.mesh._replace(
            v0=verts[faces_j[:, 0]], v1=verts[faces_j[:, 1]],
            v2=verts[faces_j[:, 2]],
        )
        bv, bc = boundary_image_grad(
            verts, faces_j, edges,
            (geoms, materials, jax.lax.stop_gradient(mesh_t), kd_t),
            camera._replace(position=jax.lax.stop_gradient(cam_pos)),
            config, key, iteration, cot,
            samples_per_edge=samples_per_edge, delta=delta,
        )
        if secondary_viewpoints > 0:
            bv = bv + boundary_secondary_grad(
                verts, faces_j, edges,
                (geoms, materials, jax.lax.stop_gradient(mesh_t), kd_t),
                camera._replace(position=jax.lax.stop_gradient(cam_pos)),
                config, key, iteration, cot,
                n_view=secondary_viewpoints,
                samples_per_edge=samples_per_edge,
                delta=secondary_delta,
            )
        return d_verts + bv, d_cam + bc, None, None

    render_geo.defvjp(fwd, bwd)
    return render_geo

"""Differentiability tests: gradients w.r.t. materials vs finite
differences (the gradcheck north star — BASELINE.json)."""

import jax
import jax.numpy as jnp
import numpy as np

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.models.inverse import make_train_step, render_loss
from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution


def _setup(cornell_scene, res=24, depth=3):
    scene = with_resolution(cornell_scene, res, res)
    config = RenderConfig(trace_depth=depth, antialias=False)
    key = jax.random.PRNGKey(0)
    return scene, config, key


def test_material_grad_matches_finite_difference(cornell_scene):
    scene, config, key = _setup(cornell_scene)
    target = jnp.zeros((24 * 24, 3), jnp.float32)

    def loss_of(materials):
        return render_loss(materials, scene, config, key, jnp.int32(1), target)

    materials = jax.tree.map(jnp.asarray, scene.materials)
    loss0, grads = jax.jit(jax.value_and_grad(loss_of))(materials)
    assert np.isfinite(float(loss0))
    g = np.asarray(grads.color)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0, "material color gradient is identically zero"

    # Central finite differences on a few of the largest-gradient entries.
    loss_jit = jax.jit(loss_of)
    flat = np.abs(g).ravel()
    check = np.argsort(flat)[-4:]
    eps = 3e-3
    for idx in check:
        i, c = divmod(int(idx), 3)
        e = np.zeros_like(np.asarray(materials.color))
        e[i, c] = eps
        lp = float(loss_jit(materials._replace(color=materials.color + e)))
        lm = float(loss_jit(materials._replace(color=materials.color - e)))
        fd = (lp - lm) / (2 * eps)
        ad = float(g[i, c])
        # Rendering is piecewise-smooth in albedo (polynomial), so FD
        # should agree tightly.
        assert abs(fd - ad) <= 2e-2 * max(abs(fd), abs(ad), 1e-3), (
            f"material[{i},{c}]: fd={fd} ad={ad}"
        )


def test_emittance_grad(cornell_scene):
    scene, config, key = _setup(cornell_scene)
    target = jnp.zeros((24 * 24, 3), jnp.float32)

    def loss_of(em):
        mats = jax.tree.map(jnp.asarray, scene.materials)._replace(emittance=em)
        return render_loss(mats, scene, config, key, jnp.int32(1), target)

    em0 = jnp.asarray(scene.materials.emittance)
    g = jax.jit(jax.grad(loss_of))(em0)
    assert np.isfinite(np.asarray(g)).all()
    # the light's emittance must matter
    assert abs(float(g[0])) > 0

    eps = 1e-2
    lp = float(loss_of(em0.at[0].add(eps)))
    lm = float(loss_of(em0.at[0].add(-eps)))
    fd = (lp - lm) / (2 * eps)
    ad = float(g[0])
    assert abs(fd - ad) <= 2e-2 * max(abs(fd), abs(ad)), f"fd={fd} ad={ad}"


def test_train_step_reduces_loss(cornell_scene):
    scene, config, key = _setup(cornell_scene, res=16, depth=2)

    # Target: render with the true materials; then perturb the wall
    # color and recover it.
    from kdtreepathtraceroptimization_tpu.render.integrator import trace_iteration

    target = trace_iteration(
        scene.geoms, scene.materials, None, None, scene.camera, config, key, jnp.int32(1)
    )

    perturbed = scene.materials._replace(
        color=np.asarray(scene.materials.color) * 0.5
    )
    scene_p = scene._replace(materials=perturbed)
    init_state, train_step = make_train_step(scene_p, config, target, learning_rate=2e-2)
    state = init_state()
    losses = []
    for s in range(12):
        state, loss = train_step(state, key, jnp.int32(1))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f"loss did not drop: {losses}"


def test_mesh_vertex_grad(cornell_scene):
    """Vertex gradients through the KD path (detached-index estimator,
    ops/mesh.refine_tri_hit).

    With pure Lambertian shading, radiance is a product of albedos —
    piecewise CONSTANT in vertex positions — so the interior (detached)
    gradient is exactly zero; visibility gradients need the edge-aware
    estimator (round 2+). The continuous geometric dependence the
    estimator must capture is subsurface depth: sdepth^2 * transmittance
    (shade.py), so with SSS enabled vertex grads are finite AND nonzero.
    """
    import tempfile

    from tests.meshutil import icosphere, write_obj
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene
    import os

    verts, faces = icosphere(1, radius=2.0, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene_path = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")
    scene = with_resolution(load_scene(scene_path, obj_path=tmp.name), 16, 16)
    config = RenderConfig(trace_depth=2, enable_kd=True)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((16 * 16, 3), jnp.float32)

    from kdtreepathtraceroptimization_tpu.render.integrator import (
        intersect_scene,
        trace_iteration,
    )
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.intersect import BIG

    # (a) radiance loss: Lambertian radiance is piecewise constant in
    # geometry, so the interior gradient must be finite (zero is correct).
    def radiance_loss(v0):
        kd = scene.kd._replace(tris=scene.kd.tris._replace(v0=v0))
        radiance = trace_iteration(
            scene.geoms, scene.materials, scene.mesh, kd, scene.camera,
            config, key, jnp.int32(1),
        )
        return jnp.mean((radiance - target) ** 2)

    v0 = jnp.asarray(scene.kd.tris.v0)
    g = np.asarray(jax.jit(jax.grad(radiance_loss))(v0))
    assert np.isfinite(g).all(), f"{np.isnan(g).sum()} NaN vertex grads"

    # (b) depth-AOV loss: hit distance depends smoothly on vertices
    # through refine_tri_hit -> nonzero gradient, checked against FD.
    rays = generate_rays(scene.camera, config, bounce_key(key, 1, 0), 1)

    # Probe one triangle: restrict the loss to the lanes that hit it so
    # float32 finite differences aren't swamped by cancellation against
    # the other ~250 lanes' t values.
    from kdtreepathtraceroptimization_tpu.ops.traverse import intersect_mesh_kd

    win = np.asarray(
        intersect_mesh_kd(rays.origin, rays.direction, scene.kd, config).tri
    )
    rows, counts = np.unique(win[win >= 0], return_counts=True)
    # interior triangle: hit by several lanes (avoid silhouette rows)
    row = int(rows[np.argmax(counts)])
    lane_mask = jnp.asarray(win == row)

    def depth_loss(v0):
        kd = scene.kd._replace(tris=scene.kd.tris._replace(v0=v0))
        hit = intersect_scene(
            rays.origin, rays.direction, scene.geoms, scene.materials,
            scene.mesh, kd, config,
        )
        return jnp.sum(jnp.where(lane_mask & (hit.t < BIG), hit.t, 0.0))

    gd = np.asarray(jax.jit(jax.grad(depth_loss))(v0))
    assert np.isfinite(gd).all()
    assert np.abs(gd).max() > 0, "depth gradient w.r.t. vertices is zero"

    dl = jax.jit(depth_loss)
    eps = 1e-3
    agree, results = 0, []
    picks = np.argsort(np.abs(gd).ravel())[-3:]
    for idx in picks:
        i, c = divmod(int(idx), 3)
        e = np.zeros(gd.shape, np.float32)
        e[i, c] = eps
        fd = (float(dl(v0 + e)) - float(dl(v0 - e))) / (2 * eps)
        ad = float(gd[i, c])
        results.append((fd, ad))
        if abs(fd - ad) <= 1e-1 * max(abs(fd), abs(ad), 1e-3):
            agree += 1
    assert agree >= 2, f"FD/AD disagree: {results}"


def test_grad_scan_equals_unroll(cornell_scene):
    """Reverse mode through lax.scan must equal the unrolled form.

    Pins the r5 resolution of the historical scan-backward NaN (the old
    [N, G] masked-sum winner select emitted 0*inf cotangents in the
    scan transpose; the channel-split graph does not) — see
    config.scan_bounces."""
    scene, _, key = _setup(cornell_scene)
    target = jnp.zeros((24 * 24, 3), jnp.float32)
    materials = jax.tree.map(jnp.asarray, scene.materials)

    def grad_of(scan):
        cfg = RenderConfig(trace_depth=4, antialias=False, enable_sss=True,
                           scan_bounces=scan)

        def loss_of(mats):
            return render_loss(mats, scene, cfg, key, jnp.int32(1), target)

        return jax.jit(jax.grad(loss_of))(materials)

    g_scan = grad_of(True)
    g_unroll = grad_of(False)
    for leaf_s, leaf_u in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_unroll)):
        a, b = np.asarray(leaf_s), np.asarray(leaf_u)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_pairs_vertex_and_material_grad(cornell_scene):
    """Gradients through the PRODUCTION pair-list intersector
    (cluster_pairs=True): material FD check + vertex depth-AOV FD check
    via cmesh.tris (the detached-index estimator, mesh.refine_tri_hit).
    VERDICT r4 item 4."""
    import os
    import tempfile

    from tests.meshutil import icosphere, write_obj
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene

    verts, faces = icosphere(2, radius=2.0, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene_path = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")
    scene = with_resolution(load_scene(scene_path, obj_path=tmp.name), 16, 16)
    assert getattr(scene, "cmesh", None) is not None
    config = RenderConfig(trace_depth=2, cluster=True, cluster_pairs=True)
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((16 * 16, 3), jnp.float32)

    # (a) material gradient FD check through the pairs render
    def loss_of(materials):
        return render_loss(materials, scene, config, key, jnp.int32(1), target)

    materials = jax.tree.map(jnp.asarray, scene.materials)
    loss0, grads = jax.jit(jax.value_and_grad(loss_of))(materials)
    assert np.isfinite(float(loss0))
    g = np.asarray(grads.color)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    loss_jit = jax.jit(loss_of)
    idx = int(np.argsort(np.abs(g).ravel())[-1])
    i, c = divmod(idx, 3)
    eps = 3e-3
    e = np.zeros_like(np.asarray(materials.color))
    e[i, c] = eps
    fd = (float(loss_jit(materials._replace(color=materials.color + e)))
          - float(loss_jit(materials._replace(color=materials.color - e)))
          ) / (2 * eps)
    ad = float(g[i, c])
    assert abs(fd - ad) <= 2e-2 * max(abs(fd), abs(ad), 1e-3), (fd, ad)

    # (b) vertex depth-AOV gradient through cmesh.tris + FD check: the
    # winner index is detached but t re-evaluates against the packed
    # rows, so d(depth)/d(vertex) is exact for interior hits.
    from kdtreepathtraceroptimization_tpu.render.integrator import intersect_scene
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
    from kdtreepathtraceroptimization_tpu.ops.pairs import intersect_mesh_pairs

    rays = generate_rays(scene.camera, config, bounce_key(key, 1, 0), 1)
    win = np.asarray(
        intersect_mesh_pairs(rays.origin, rays.direction, scene.cmesh,
                             config).tri
    )
    rows, counts = np.unique(win[win >= 0], return_counts=True)
    row = int(rows[np.argmax(counts)])
    lane_mask = jnp.asarray(win == row)
    v0 = jnp.asarray(scene.cmesh.tris.v0)

    def depth_loss(v0_):
        cmesh = scene.cmesh._replace(
            tris=scene.cmesh.tris._replace(v0=v0_))
        hit = intersect_scene(
            rays.origin, rays.direction, scene.geoms, scene.materials,
            scene.mesh, scene.kd, config, cmesh=cmesh,
        )
        return jnp.sum(jnp.where(lane_mask & (hit.t < BIG), hit.t, 0.0))

    gd = np.asarray(jax.jit(jax.grad(depth_loss))(v0))
    assert np.isfinite(gd).all()
    assert np.abs(gd).max() > 0, "pairs depth grad w.r.t. vertices is zero"

    dl = jax.jit(depth_loss)
    eps = 1e-3
    agree, results = 0, []
    for idx in np.argsort(np.abs(gd).ravel())[-3:]:
        i, c = divmod(int(idx), 3)
        e = np.zeros(gd.shape, np.float32)
        e[i, c] = eps
        fd = (float(dl(v0 + e)) - float(dl(v0 - e))) / (2 * eps)
        ad = float(gd[i, c])
        results.append((fd, ad))
        if abs(fd - ad) <= 1e-1 * max(abs(fd), abs(ad), 1e-3):
            agree += 1
    assert agree >= 2, f"FD/AD disagree: {results}"


CAMERA_SSS_SCENE = """\
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .6 .8 .9
SPECEX      0
SPECRGB     1 1 1
REFL        0
REFR        1
REFRIOR     1.3
EMITTANCE   0
TRANSMITTANCE .9 .7 .5

CAMERA
RES         16 16
FOVY        45
ITERATIONS  1
DEPTH       4
FILE        camgrad
EYE         0 0 2.3
LOOKAT      0 0 0
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 6 0
ROTAT       0 0 0
SCALE       8 .3 8

OBJECT 1
sphere
material 1
TRANS       0 0 0
ROTAT       0 0 0
SCALE       3 3 3
"""


def test_camera_grad_matches_finite_difference():
    """Gradients flow through the camera (VERDICT r1 item 5: the round-1
    raygen cast pixel_length through float(), severing them).

    Radiance here depends CONTINUOUSLY on the camera through the
    subsurface path: the SSS quirk sets sdepth = |old origin - hit|
    (interactions.h:205-229), shade() applies clip(sdepth,0,1)^2 *
    transmittance, so with the eye < 1 unit from the SSS sphere's
    surface (radius 1.5, eye z=2.3) the image varies smoothly with eye
    position. Checks AD vs central finite differences on the eye
    position and fov.
    """
    from kdtreepathtraceroptimization_tpu.ops.camera import derive_camera
    from kdtreepathtraceroptimization_tpu.render.integrator import trace_iteration
    from kdtreepathtraceroptimization_tpu.scene.parser import parse_scene_text

    scene = parse_scene_text(CAMERA_SSS_SCENE)
    config = RenderConfig(trace_depth=4, enable_sss=True)
    key = jax.random.PRNGKey(0)

    # Interior-pixel mask: the FD of the FULL image is dominated by
    # silhouette pixels flipping on/off the sphere (the visibility
    # discontinuity the edge-aware estimator handles); the interior
    # gradcheck must only look at pixels that stay on the sphere.
    xs = np.arange(16)
    inner = (np.abs(xs - 7.5)[None, :] <= 3.5) & (np.abs(xs - 7.5)[:, None] <= 3.5)
    mask = jnp.asarray(inner.reshape(-1).astype(np.float32))[:, None]

    def loss_of(params):
        eye, fovy = params
        cam = derive_camera(scene.camera.resolution, fovy, eye,
                            scene.camera.look_at, jnp.asarray([0.0, 1.0, 0.0]))
        radiance = trace_iteration(
            scene.geoms, scene.materials, None, None, cam, config, key,
            jnp.int32(1),
        )
        return jnp.sum(radiance * mask) / radiance.shape[0]

    params = (jnp.asarray([0.0, 0.0, 2.3]), jnp.asarray(45.0))
    loss_jit = jax.jit(loss_of)
    grads = jax.jit(jax.grad(loss_of))(params)
    g_eye, g_fov = np.asarray(grads[0]), float(grads[1])
    assert np.isfinite(g_eye).all() and np.isfinite(g_fov)
    assert np.abs(g_eye).max() > 0, "camera position gradient is zero"

    # FD check on eye z (dominant axis) and fov.
    def fd(i, eps):
        if i < 3:
            e = np.zeros(3, np.float32); e[i] = eps
            up = (params[0] + e, params[1])
            dn = (params[0] - e, params[1])
        else:
            up = (params[0], params[1] + eps)
            dn = (params[0], params[1] - eps)
        return (float(loss_jit(up)) - float(loss_jit(dn))) / (2 * eps)

    checks = [(2, float(g_eye[2]), fd(2, 1e-2)), (3, g_fov, fd(3, 1e-2))]
    for i, ad, f in checks:
        assert abs(f - ad) <= 0.15 * max(abs(f), abs(ad), 1e-4), (
            f"param {i}: FD {f} vs AD {ad}"
        )


def test_camera_orbit_pan_look_from():
    """Camera controller equivalents of main.cpp:1110-1185: orbit keeps
    the distance to look_at, pan translates both ends, look_from
    re-derives a consistent orthonormal basis."""
    from kdtreepathtraceroptimization_tpu.ops.camera import (
        look_from, orbit_camera, pan_camera,
    )
    from kdtreepathtraceroptimization_tpu.scene.parser import parse_scene_text

    cam = parse_scene_text(CAMERA_SSS_SCENE).camera
    r0 = np.linalg.norm(np.asarray(cam.position) - np.asarray(cam.look_at))

    orb = orbit_camera(cam, d_phi=0.7, d_theta=0.2)
    r1 = float(jnp.linalg.norm(jnp.asarray(orb.position) - jnp.asarray(orb.look_at)))
    assert abs(r1 - r0) < 1e-4
    # basis orthonormal, view points at look_at
    for a, b in [(orb.view, orb.up), (orb.view, orb.right), (orb.up, orb.right)]:
        assert abs(float(jnp.dot(jnp.asarray(a), jnp.asarray(b)))) < 1e-5
    want = np.asarray(orb.look_at) - np.asarray(orb.position)
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(orb.view), want, atol=1e-5)

    zoomed = orbit_camera(cam, d_zoom=-2.0)
    r2 = float(jnp.linalg.norm(jnp.asarray(zoomed.position) - jnp.asarray(zoomed.look_at)))
    assert abs(r2 - (r0 - 2.0)) < 1e-4

    pan = pan_camera(cam, dx=1.0, dy=-0.5)
    shift = np.asarray(pan.position) - np.asarray(cam.position)
    shift2 = np.asarray(pan.look_at) - np.asarray(cam.look_at)
    np.testing.assert_allclose(shift, shift2, atol=1e-5)
    assert np.linalg.norm(shift) > 0.9

    moved = look_from(cam, jnp.asarray([3.0, 3.0, 3.0]))
    np.testing.assert_allclose(np.asarray(moved.position), [3, 3, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(moved.look_at), np.asarray(cam.look_at), atol=1e-6)

"""Camera ray generation — pinhole + antialiasing + depth of field.

TPU-native re-design of generateRayFromCamera (reference:
src/pathtrace.cu:315-397). The CUDA version is one thread per pixel in
8x8 blocks; here the whole ``[N = W*H]`` ray batch is produced by dense
vector ops in one fused XLA computation.

Orientation note: the reference builds directions with ``-right`` and
mirrors x at save time (main.cpp:1092-1098). We use ``+right`` and no
mirror — identical final images.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import sampling, vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.rng import uniform_cols
from kdtreepathtraceroptimization_tpu.ops.vecmath import V3
from kdtreepathtraceroptimization_tpu.scene.structs import Camera


class RaySoA(NamedTuple):
    """Wavefront path state — SoA version of PathSegment + Ray
    (reference: sceneStructs.h:15-24, 66-74).

    Vector fields are channel-split ``vm.V3`` of [N] arrays (the
    TPU-fast layout; vecmath.py documents the measured 10x gap vs
    [N, 3] tiles). Every pytree leaf is therefore a flat [N] array,
    which also makes the compaction sort's multi-operand form trivial.
    """

    origin: V3  # V3 of [N] f32
    direction: V3  # V3 of [N] f32
    color: V3  # V3 of [N] f32 throughput
    is_inside: jax.Array  # [N] bool
    sdepth: jax.Array  # [N] f32 subsurface depth
    pixel_index: jax.Array  # [N] int32
    remaining_bounces: jax.Array  # [N] int32


def derive_camera(resolution, fov_y_deg, position, look_at, up) -> Camera:
    """Differentiable camera derivation (jnp version of the scene
    parser's camera setup, reference: scene.cpp:217-234 + the basis fix
    in runCuda, main.cpp:1118-1123).

    ``resolution`` must be concrete (it fixes shapes); every other
    argument may be a tracer, so ``jax.grad`` flows through fov,
    position, and look_at into the rendered image.
    """
    import numpy as np

    resolution = np.asarray(resolution, np.int32)
    position = jnp.asarray(position, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fov_y = jnp.asarray(fov_y_deg, jnp.float32)

    yscaled = jnp.tan(jnp.deg2rad(fov_y))
    xscaled = yscaled * resolution[0] / resolution[1]
    fov_x = jnp.rad2deg(jnp.arctan(xscaled))
    pixel_length = jnp.stack(
        [2.0 * xscaled / resolution[0], 2.0 * yscaled / resolution[1]]
    )

    view = vm.normalize(look_at - position)
    right = vm.normalize(jnp.cross(view, up))
    up_ortho = vm.normalize(jnp.cross(right, view))

    return Camera(
        resolution=resolution,
        position=position,
        look_at=look_at,
        view=view,
        up=up_ortho,
        right=right,
        fov=jnp.stack([fov_x, fov_y]),
        pixel_length=pixel_length,
    )


def look_from(camera: Camera, eye, look_at=None, up=None) -> Camera:
    """Move the camera, keeping resolution/fov — the convenience the
    reference lacked between renders (its camera only moved through the
    mouse controller, main.cpp:1110-1185)."""
    return derive_camera(
        camera.resolution,
        jnp.asarray(camera.fov)[1],
        eye,
        camera.look_at if look_at is None else look_at,
        camera.up if up is None else up,
    )


def _spherical_state(camera: Camera):
    """(radius, theta, phi) of the eye around look_at — the reference
    keeps (zoom, theta, phi) as mutable globals (main.cpp:1052-1073);
    here they are derived from the camera itself."""
    offset = jnp.asarray(camera.position) - jnp.asarray(camera.look_at)
    r = vm.safe_norm(offset)
    theta = jnp.arccos(jnp.clip(offset[1] / r, -1.0, 1.0))  # polar from +y
    phi = jnp.arctan2(offset[0], offset[2])
    return r, theta, phi


def orbit_camera(camera: Camera, d_phi: float = 0.0, d_theta: float = 0.0,
                 d_zoom: float = 0.0) -> Camera:
    """Spherical orbit + zoom about look_at (the mouse drag / scroll
    controller, reference: main.cpp:1110-1137, 1307-1343). Any camera
    change implies the film restarts from iteration 0, as in the
    reference (camchanged -> iteration = 0)."""
    r, theta, phi = _spherical_state(camera)
    r = jnp.maximum(r + d_zoom, 1e-3)
    # clamp polar angle away from the poles like the reference's
    # theta clamp (main.cpp keeps theta in (0, pi))
    theta = jnp.clip(theta + d_theta, 1e-3, jnp.pi - 1e-3)
    phi = phi + d_phi
    eye = jnp.asarray(camera.look_at) + r * jnp.stack(
        [jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta), jnp.sin(theta) * jnp.cos(phi)]
    )
    return look_from(camera, eye, up=jnp.asarray([0.0, 1.0, 0.0]))


def pan_camera(camera: Camera, dx: float = 0.0, dy: float = 0.0) -> Camera:
    """Translate eye and look_at in the view plane (right-mouse pan,
    reference: main.cpp:1329-1343)."""
    shift = jnp.asarray(camera.right) * dx + jnp.asarray(camera.up) * dy
    return look_from(
        camera,
        jnp.asarray(camera.position) + shift,
        look_at=jnp.asarray(camera.look_at) + shift,
    )


def generate_rays(
    camera: Camera,
    config: RenderConfig,
    key: jax.Array,
    trace_depth: int,
) -> RaySoA:
    """Generate one camera ray per pixel.

    The pixel grid is flattened row-major (index = x + y*W, matching the
    reference's pixel indexing at pathtrace.cu:321).

    Fully traceable in every continuous camera field: position, view,
    up, right, and pixel_length may be jnp tracers, so gradients flow
    to camera pose/intrinsics (only ``resolution`` must be concrete —
    it fixes array shapes). Use ``derive_camera`` to build those fields
    differentiably from (position, look_at, up, fov).
    """
    res_x = int(camera.resolution[0])
    res_y = int(camera.resolution[1])
    n = res_x * res_y

    idx = jnp.arange(n, dtype=jnp.int32)
    x = (idx % res_x).astype(jnp.float32)
    y = (idx // res_x).astype(jnp.float32)

    view = vm.v3_splat(camera.view)
    up = vm.v3_splat(camera.up)
    right = vm.v3_splat(camera.right)
    pl = jnp.asarray(camera.pixel_length)
    px, py = pl[0], pl[1]

    sx = px * (x - res_x * 0.5)
    sy = py * (y - res_y * 0.5)
    direction = vm.normalizev(view + right * sx - up * sy)

    u = uniform_cols(key, n, 6)

    if config.antialias:
        # "cheap jitter" path (pathtrace.cu:341-350): add a random
        # positive-octant unit vector scaled by jitterscale.
        j = vm.normalizev(V3(u[0], u[1], u[2]))
        direction = vm.normalizev(direction + j * config.aa_jitter_scale)

    position = jnp.asarray(camera.position)
    origin = V3(
        jnp.broadcast_to(position[0], (n,)),
        jnp.broadcast_to(position[1], (n,)),
        jnp.broadcast_to(position[2], (n,)),
    )

    if config.dof_angle > 0.0:
        # Depth of field (pathtrace.cu:364-393): rotate the ray direction
        # by a random small quaternion and pivot the origin about the
        # focal point so the focal plane stays sharp.
        axis = sampling.uniform_sphere_v(u[3], u[4])
        rand_angle = u[5] * jnp.pi * config.dof_angle
        randrot = vm.normalizev(
            vm.rotate_about_axisv(direction, axis, rand_angle))
        origin = (origin + direction * config.focal_length
                  - randrot * config.focal_length)
        direction = randrot

    one = jnp.ones((n,), jnp.float32)
    return RaySoA(
        origin=origin,
        direction=direction,
        color=V3(one, one, one),
        is_inside=jnp.zeros((n,), jnp.bool_),
        sdepth=jnp.zeros((n,), jnp.float32),
        pixel_index=idx,
        remaining_bounces=jnp.full((n,), trace_depth, jnp.int32),
    )

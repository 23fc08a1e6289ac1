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
from kdtreepathtraceroptimization_tpu.ops.rng import uniforms
from kdtreepathtraceroptimization_tpu.scene.structs import Camera


class RaySoA(NamedTuple):
    """Wavefront path state — SoA version of PathSegment + Ray
    (reference: sceneStructs.h:15-24, 66-74)."""

    origin: jax.Array  # [N, 3] f32
    direction: jax.Array  # [N, 3] f32
    color: jax.Array  # [N, 3] f32 throughput
    is_inside: jax.Array  # [N] bool
    sdepth: jax.Array  # [N] f32 subsurface depth
    pixel_index: jax.Array  # [N] int32
    remaining_bounces: jax.Array  # [N] int32


def generate_rays(
    camera: Camera,
    config: RenderConfig,
    key: jax.Array,
    trace_depth: int,
) -> RaySoA:
    """Generate one camera ray per pixel.

    The pixel grid is flattened row-major (index = x + y*W, matching the
    reference's pixel indexing at pathtrace.cu:321).
    """
    res_x = int(camera.resolution[0])
    res_y = int(camera.resolution[1])
    n = res_x * res_y

    idx = jnp.arange(n, dtype=jnp.int32)
    x = (idx % res_x).astype(jnp.float32)
    y = (idx // res_x).astype(jnp.float32)

    view = jnp.asarray(camera.view)
    up = jnp.asarray(camera.up)
    right = jnp.asarray(camera.right)
    position = jnp.asarray(camera.position)
    px, py = float(camera.pixel_length[0]), float(camera.pixel_length[1])

    direction = vm.normalize(
        view[None, :]
        + right[None, :] * (px * (x - res_x * 0.5))[:, None]
        - up[None, :] * (py * (y - res_y * 0.5))[:, None]
    )

    u = uniforms(key, n, 8)

    if config.antialias:
        # "cheap jitter" path (pathtrace.cu:341-350): add a random
        # positive-octant unit vector scaled by jitterscale.
        v3 = vm.normalize(u[:, 0:3])
        direction = vm.normalize(direction + v3 * config.aa_jitter_scale)

    origin = jnp.broadcast_to(position[None, :], (n, 3))

    if config.dof_angle > 0.0:
        # Depth of field (pathtrace.cu:364-393): rotate the ray direction
        # by a random small quaternion and pivot the origin about the
        # focal point so the focal plane stays sharp.
        axis = sampling.uniform_sphere(u[:, 3], u[:, 4])
        rand_angle = u[:, 5] * jnp.pi * config.dof_angle
        randrot = vm.quat_rotate(direction, axis, rand_angle)
        randrot = vm.normalize(randrot)
        origin = origin + direction * config.focal_length - randrot * config.focal_length
        direction = randrot

    return RaySoA(
        origin=origin,
        direction=direction,
        color=jnp.ones((n, 3), jnp.float32),
        is_inside=jnp.zeros((n,), jnp.bool_),
        sdepth=jnp.zeros((n,), jnp.float32),
        pixel_index=idx,
        remaining_bounces=jnp.full((n,), trace_depth, jnp.int32),
    )

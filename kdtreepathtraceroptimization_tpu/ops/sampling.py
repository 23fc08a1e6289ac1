"""Direction sampling helpers (reference: src/interactions.h:9-83).

All functions are batched over a leading ray axis and consume pre-drawn
uniform columns instead of a stateful RNG — the wavefront equivalent of
the reference's per-thread thrust engines.
"""

from __future__ import annotations

import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import vecmath as vm

SQRT_ONE_THIRD = 0.5773502691896258
PI = 3.141592653589793
TWO_PI = 6.283185307179586


def cosine_hemisphere(normal, u1, u2):
    """Cosine-weighted hemisphere sample around ``normal``.

    Mirrors calculateRandomDirectionInHemisphere (interactions.h:9-41)
    including the Peter Kutz not-normal basis trick, vectorized with
    ``jnp.where`` instead of branches.
    """
    up = jnp.sqrt(u1)  # cos(theta)
    over = jnp.sqrt(jnp.maximum(1.0 - up * up, 0.0))  # sin(theta)
    around = u2 * TWO_PI

    ax = jnp.abs(normal[..., 0:1])
    ay = jnp.abs(normal[..., 1:2])
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], normal.dtype), normal.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], normal.dtype), normal.shape)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], normal.dtype), normal.shape)
    not_normal = jnp.where(
        ax < SQRT_ONE_THIRD, ex, jnp.where(ay < SQRT_ONE_THIRD, ey, ez)
    )

    p1 = vm.normalize(vm.cross(normal, not_normal))
    p2 = vm.normalize(vm.cross(normal, p1))

    return (
        up[..., None] * normal
        + (jnp.cos(around) * over)[..., None] * p1
        + (jnp.sin(around) * over)[..., None] * p2
    )


def rand_spherical_vec(angle: float, u1, u2):
    """Random direction in a cone near (0,0,-1) of aperture ``angle``.

    Mirrors randSphericalVec (interactions.h:67-83):
    theta = 2*pi*u1, phi = acos(angle*pi*u2 - 1).
    """
    theta = TWO_PI * u1
    phi = jnp.arccos(jnp.clip(angle * PI * u2 - 1.0, -1.0, 1.0))
    sp = jnp.sin(phi)
    return jnp.stack(
        [jnp.cos(theta) * sp, jnp.sin(theta) * sp, jnp.cos(phi)], axis=-1
    )


def rotate_cone_sample(direction, v):
    """Rotate a near -z cone sample ``v`` so the cone axis lands on
    ``direction`` — the jitter pattern used for SSS entry and soft
    reflections (interactions.h:213-217, 259-266).

    The reference rotates around ``axis = normalize(cross(-z, dir))`` by
    ``angle = acos(dot(-z, dir))``, which maps -z onto dir. Degenerate
    when dir is parallel to z: fall back to dir itself.
    """
    minus_z = jnp.array([0.0, 0.0, -1.0], direction.dtype)
    # Clip strictly inside (-1, 1): arccos' blows up at the endpoints and
    # would poison reverse-mode gradients for near-axial directions.
    cosang = jnp.clip(-direction[..., 2], -1.0 + 1e-6, 1.0 - 1e-6)
    angle = jnp.arccos(cosang)
    axis = jnp.cross(jnp.broadcast_to(minus_z, direction.shape), direction)
    axis_len = vm.norm(axis)
    degenerate = axis_len < 1e-6
    safe_axis = jnp.where(
        degenerate[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], direction.dtype), direction.shape),
        axis,
    )
    rotated = vm.rotate_about_axis(v, safe_axis, angle)
    # If dir ≈ -z the identity rotation is right; if dir ≈ +z the sample
    # should be flipped.
    flipped = jnp.where(direction[..., 2:3] > 0, -v, v)
    return jnp.where(degenerate[..., None], flipped, rotated)


def uniform_sphere(u1, u2):
    """Uniform direction on the sphere (used for the DoF rotation axis,
    pathtrace.cu:364-371: u = cos(pi*u1), theta = 2*pi*u2)."""
    u = jnp.cos(PI * u1)
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    theta = TWO_PI * u2
    return jnp.stack([s * jnp.cos(theta), s * jnp.sin(theta), u], axis=-1)


def schlick_fresnel(incident, normal, ior):
    """Schlick 5th-power Fresnel approximation
    (reference: getFresnelVal, interactions.h:126-133)."""
    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    cos_term = jnp.clip(vm.dot(normal, -incident), -1.0, 1.0)
    return r0 + (1.0 - r0) * (1.0 - cos_term) ** 5

"""Direction sampling helpers (reference: src/interactions.h:9-83).

All functions are batched over a leading ray axis and consume pre-drawn
uniform columns instead of a stateful RNG — the wavefront equivalent of
the reference's per-thread thrust engines.

Two forms per helper: the ``*_v`` channel-split form (V3 of [N] arrays
— the TPU-fast layout, see vecmath.py) used by the hot path, and an
[N, 3]-array wrapper keeping the original public signature.
"""

from __future__ import annotations

import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.vecmath import V3

SQRT_ONE_THIRD = 0.5773502691896258
PI = 3.141592653589793
TWO_PI = 6.283185307179586


def cosine_hemisphere_v(normal: V3, u1, u2) -> V3:
    """Cosine-weighted hemisphere sample around ``normal``.

    Mirrors calculateRandomDirectionInHemisphere (interactions.h:9-41)
    including the Peter Kutz not-normal basis trick, vectorized with
    ``jnp.where`` instead of branches.
    """
    up = jnp.sqrt(u1)  # cos(theta)
    over = jnp.sqrt(jnp.maximum(1.0 - up * up, 0.0))  # sin(theta)
    around = u2 * TWO_PI

    # not_normal = first of ex/ey/ez whose |normal| component < 1/sqrt(3)
    ax = jnp.abs(normal.x)
    ay = jnp.abs(normal.y)
    use_x = ax < SQRT_ONE_THIRD
    use_y = ~use_x & (ay < SQRT_ONE_THIRD)
    one = jnp.ones_like(normal.x)
    zero = jnp.zeros_like(normal.x)
    not_normal = V3(
        jnp.where(use_x, one, zero),
        jnp.where(use_y, one, zero),
        jnp.where(use_x | use_y, zero, one),
    )

    p1 = vm.normalizev(vm.crossv(normal, not_normal))
    p2 = vm.normalizev(vm.crossv(normal, p1))

    c1 = jnp.cos(around) * over
    c2 = jnp.sin(around) * over
    return normal * up + p1 * c1 + p2 * c2


def cosine_hemisphere(normal, u1, u2):
    """[N, 3] wrapper over cosine_hemisphere_v."""
    return vm.v3_to_rows(cosine_hemisphere_v(vm.v3_from_rows(normal), u1, u2))


def rand_spherical_vec_v(angle: float, u1, u2) -> V3:
    """Random direction in a cone near (0,0,-1) of aperture ``angle``.

    Mirrors randSphericalVec (interactions.h:67-83):
    theta = 2*pi*u1, phi = acos(angle*pi*u2 - 1).
    """
    theta = TWO_PI * u1
    phi = jnp.arccos(jnp.clip(angle * PI * u2 - 1.0, -1.0, 1.0))
    sp = jnp.sin(phi)
    return V3(jnp.cos(theta) * sp, jnp.sin(theta) * sp, jnp.cos(phi))


def rand_spherical_vec(angle: float, u1, u2):
    """[N, 3] wrapper over rand_spherical_vec_v."""
    return vm.v3_to_rows(rand_spherical_vec_v(angle, u1, u2))


def rotate_cone_sample_v(direction: V3, v: V3) -> V3:
    """Rotate a near -z cone sample ``v`` so the cone axis lands on
    ``direction`` — the jitter pattern used for SSS entry and soft
    reflections (interactions.h:213-217, 259-266).

    The reference rotates around ``axis = normalize(cross(-z, dir))`` by
    ``angle = acos(dot(-z, dir))``, which maps -z onto dir. Degenerate
    when dir is parallel to z: fall back to dir itself.
    """
    # Clip strictly inside (-1, 1): arccos' blows up at the endpoints and
    # would poison reverse-mode gradients for near-axial directions.
    cosang = jnp.clip(-direction.z, -1.0 + 1e-6, 1.0 - 1e-6)
    angle = jnp.arccos(cosang)
    # cross((0,0,-1), dir) = (dir.y, -dir.x, 0)
    axis = V3(direction.y, -direction.x, jnp.zeros_like(direction.x))
    axis_len = vm.normv(axis)
    degenerate = axis_len < 1e-6
    one = jnp.ones_like(direction.x)
    zero = jnp.zeros_like(direction.x)
    safe_axis = vm.wherev(degenerate, V3(one, zero, zero), axis)
    rotated = vm.rotate_about_axisv(v, safe_axis, angle)
    # If dir ≈ -z the identity rotation is right; if dir ≈ +z the sample
    # should be flipped.
    flipped = vm.wherev(direction.z > 0, -v, v)
    return vm.wherev(degenerate, flipped, rotated)


def rotate_cone_sample(direction, v):
    """[N, 3] wrapper over rotate_cone_sample_v."""
    return vm.v3_to_rows(
        rotate_cone_sample_v(vm.v3_from_rows(direction), vm.v3_from_rows(v))
    )


def uniform_sphere_v(u1, u2) -> V3:
    """Uniform direction on the sphere (used for the DoF rotation axis,
    pathtrace.cu:364-371: u = cos(pi*u1), theta = 2*pi*u2)."""
    u = jnp.cos(PI * u1)
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    theta = TWO_PI * u2
    return V3(s * jnp.cos(theta), s * jnp.sin(theta), u)


def uniform_sphere(u1, u2):
    """[N, 3] wrapper over uniform_sphere_v."""
    return vm.v3_to_rows(uniform_sphere_v(u1, u2))


def schlick_fresnel_v(incident: V3, normal: V3, ior):
    """Schlick 5th-power Fresnel approximation
    (reference: getFresnelVal, interactions.h:126-133)."""
    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    cos_term = jnp.clip(-vm.dotv(normal, incident), -1.0, 1.0)
    return r0 + (1.0 - r0) * (1.0 - cos_term) ** 5


def schlick_fresnel(incident, normal, ior):
    """[N, 3]-array wrapper over schlick_fresnel_v."""
    return schlick_fresnel_v(
        vm.v3_from_rows(incident), vm.v3_from_rows(normal), ior
    )

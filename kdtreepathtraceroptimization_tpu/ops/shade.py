"""Throughput shading — the wavefront form of shadeMaterial.

Re-design of the reference's shading kernel (src/pathtrace.cu:2304-2369):
light hits multiply in emittance and terminate; surface hits multiply the
albedo (plus specular/SSS terms, using the reference's additive blend);
misses zero the path. Everything is a masked vector update, fully
differentiable w.r.t. the material parameters. Vectors are channel-split
(``vm.V3`` of [N] arrays — see vecmath.py for the measured layout gap).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.bsdf import MaterialLanes
from kdtreepathtraceroptimization_tpu.ops.vecmath import V3


def shade(
    color: V3,  # V3 of [N] current throughput
    remaining_bounces: jax.Array,  # [N] int32
    hit_t: jax.Array,  # [N] f32, BIG = miss
    mat: MaterialLanes,
    sdepth: jax.Array,  # [N] f32 (pre-scatter sdepth of the arriving ray)
    enable_sss: bool,
    big: float = 1e30,
) -> Tuple[V3, jax.Array]:
    """Returns (new_color, new_remaining_bounces).

    Matches pathtrace.cu:2304-2369 exactly, including the reference's
    additive specular blend (``color *= albedo + k*specular``, a
    C++ operator-precedence artifact it renders with) and the sdepth^2
    SSS attenuation (pathtrace.cu:2339-2346).
    """
    if not isinstance(color, V3):
        color = vm.v3_from_rows(color)
    active = remaining_bounces > 0
    is_hit = hit_t < big

    is_light = mat.emittance > 0.0

    # Light hit: color *= albedo * emittance, terminate.
    light_color = color * mat.color * mat.emittance

    # Surface hit: additive blend factor by material class.
    sss_amount = jnp.clip(sdepth, 0.0, 1.0) ** 2
    t3 = mat.transmittance
    has_sss = (t3.x > 0.0) | (t3.y > 0.0) | (t3.z > 0.0)

    factor = mat.color
    factor = vm.wherev(
        mat.has_reflective > 0.0,
        mat.color + mat.specular_color * mat.has_reflective,
        factor,
    )
    factor = vm.wherev(
        mat.has_refractive > 0.0,
        mat.color + mat.specular_color * mat.has_refractive,
        factor,
    )
    if enable_sss:
        factor = vm.wherev(
            has_sss,
            mat.color
            + mat.specular_color * mat.has_refractive
            + mat.transmittance * sss_amount,
            factor,
        )
    surface_color = color * factor

    zero = jnp.zeros_like(hit_t)
    new_color = vm.wherev(
        is_hit,
        vm.wherev(is_light, light_color, surface_color),
        V3(zero, zero, zero),
    )
    new_bounces = jnp.where(
        is_hit,
        jnp.where(is_light, 0, remaining_bounces - 1),
        0,
    )

    # Inactive lanes keep their state.
    return (
        vm.wherev(active, new_color, color),
        jnp.where(active, new_bounces, remaining_bounces),
    )

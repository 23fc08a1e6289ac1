"""Throughput shading — the wavefront form of shadeMaterial.

Re-design of the reference's shading kernel (src/pathtrace.cu:2304-2369):
light hits multiply in emittance and terminate; surface hits multiply the
albedo (plus specular/SSS terms, using the reference's additive blend);
misses zero the path. Everything is a masked vector update, fully
differentiable w.r.t. the material parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops.bsdf import MaterialLanes


def shade(
    color: jax.Array,  # [N, 3] current throughput
    remaining_bounces: jax.Array,  # [N] int32
    hit_t: jax.Array,  # [N] f32, BIG = miss
    mat: MaterialLanes,
    sdepth: jax.Array,  # [N] f32 (pre-scatter sdepth of the arriving ray)
    enable_sss: bool,
    big: float = 1e30,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (new_color, new_remaining_bounces).

    Matches pathtrace.cu:2304-2369 exactly, including the reference's
    additive specular blend (``color *= albedo + k*specular``, a
    C++ operator-precedence artifact it renders with) and the sdepth^2
    SSS attenuation (pathtrace.cu:2339-2346).
    """
    active = remaining_bounces > 0
    is_hit = hit_t < big

    is_light = mat.emittance > 0.0

    # Light hit: color *= albedo * emittance, terminate.
    light_color = color * mat.color * mat.emittance[:, None]

    # Surface hit: additive blend factor by material class.
    sss_amount = jnp.clip(sdepth, 0.0, 1.0) ** 2
    has_sss = jnp.any(mat.transmittance > 0.0, axis=-1)

    factor = mat.color
    factor = jnp.where(
        (mat.has_reflective > 0.0)[:, None],
        mat.color + mat.has_reflective[:, None] * mat.specular_color,
        factor,
    )
    factor = jnp.where(
        (mat.has_refractive > 0.0)[:, None],
        mat.color + mat.has_refractive[:, None] * mat.specular_color,
        factor,
    )
    if enable_sss:
        factor = jnp.where(
            has_sss[:, None],
            mat.color
            + mat.has_refractive[:, None] * mat.specular_color
            + sss_amount[:, None] * mat.transmittance,
            factor,
        )
    surface_color = color * factor

    new_color = jnp.where(
        is_hit[:, None],
        jnp.where(is_light[:, None], light_color, surface_color),
        jnp.zeros_like(color),
    )
    new_bounces = jnp.where(
        is_hit,
        jnp.where(is_light, 0, remaining_bounces - 1),
        0,
    )

    # Inactive lanes keep their state.
    return (
        jnp.where(active[:, None], new_color, color),
        jnp.where(active, new_bounces, remaining_bounces),
    )

"""BSDF scattering — the branchless wavefront form of scatterRay.

Re-design of the reference's in-kernel scatter (src/interactions.h:195-358).
The CUDA version is a per-thread priority chain of branches consuming a
stateful RNG; the TPU version evaluates every branch's direction for every
lane with dense vector math and composes the result with nested
``jnp.where`` — no divergence, full VPU occupancy. Decision uniforms come
from pre-drawn columns.

Priority chain (identical to the reference):
  1. transmittance > 0        -> subsurface scattering
  2. has_refractive != 0      -> Fresnel split refract/reflect
  3. has_reflective != 0      -> probabilistic mirror
  4. otherwise                -> cosine-hemisphere diffuse
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import sampling, vecmath as vm


class MaterialLanes(NamedTuple):
    """Per-ray gathered material parameters."""

    color: jax.Array  # [N, 3]
    specular_color: jax.Array  # [N, 3]
    has_reflective: jax.Array  # [N]
    has_refractive: jax.Array  # [N]
    index_of_refraction: jax.Array  # [N]
    emittance: jax.Array  # [N]
    transmittance: jax.Array  # [N, 3]


def gather_materials(materials, material_id) -> MaterialLanes:
    """Gather the material table rows hit by each ray.

    The reference reads ``materials[intersection.materialId]`` per thread
    (pathtrace.cu:2327). Here the 13 material scalars are packed into ONE
    [M, 13] row so the per-lane lookup is a single row gather — on TPU
    gather cost is per OP, not per byte, so seven field gathers cost 7x
    one packed gather. Misses (id < 0) clamp to row 0 — callers mask on
    hit anyway.
    """
    mid = jnp.maximum(material_id, 0)
    packed = jnp.concatenate(
        [
            jnp.asarray(materials.color, jnp.float32),
            jnp.asarray(materials.specular_color, jnp.float32),
            jnp.asarray(materials.has_reflective, jnp.float32)[:, None],
            jnp.asarray(materials.has_refractive, jnp.float32)[:, None],
            jnp.asarray(materials.index_of_refraction, jnp.float32)[:, None],
            jnp.asarray(materials.emittance, jnp.float32)[:, None],
            jnp.asarray(materials.transmittance, jnp.float32),
        ],
        axis=1,
    )  # [M, 13] — constant-folded at trace time
    row = packed[mid]  # [N, 13] — the one gather
    return MaterialLanes(
        color=row[:, 0:3],
        specular_color=row[:, 3:6],
        has_reflective=row[:, 6],
        has_refractive=row[:, 7],
        index_of_refraction=row[:, 8],
        emittance=row[:, 9],
        transmittance=row[:, 10:13],
    )


class ScatterResult(NamedTuple):
    origin: jax.Array  # [N, 3]
    direction: jax.Array  # [N, 3]
    is_inside: jax.Array  # [N] bool
    sdepth: jax.Array  # [N] f32


def scatter(
    origin,
    direction,
    is_inside,
    point,
    normal,
    mat: MaterialLanes,
    u,  # [N, >=8] uniforms
    softness: float,
) -> ScatterResult:
    """Sample the next ray. Mirrors scatterRay (interactions.h:195-358).

    ``u`` columns: 0=branch pick, 1/2=diffuse, 3/4=cone jitter,
    5=reflect-vs-diffuse pick, 6=refract-vs-diffuse pick.
    """
    direction = vm.normalize(direction)
    normal_n = vm.normalize(normal)

    diffuse_dir = sampling.cosine_hemisphere(normal_n, u[:, 1], u[:, 2])
    diffuse_origin = point + normal_n * 1e-5

    # --- Branch 1: SSS (interactions.h:205-229) -------------------------
    sss_cone = sampling.rand_spherical_vec(0.0001, u[:, 3], u[:, 4])
    sss_dir = sampling.rotate_cone_sample(direction, sss_cone)
    # Reference quirk kept: the SSS-entry ray restarts from the *old*
    # origin (+eps), not the hit point, and sdepth = |origin - hit|.
    sss_origin = origin + sss_dir * 1e-4
    sss_sdepth = vm.safe_norm(sss_origin - point)
    sss_enter = (u[:, 0] < 0.5) & ~is_inside

    sss_res = ScatterResult(
        origin=jnp.where(sss_enter[:, None], sss_origin, diffuse_origin),
        direction=jnp.where(sss_enter[:, None], sss_dir, diffuse_dir),
        is_inside=jnp.where(sss_enter, True, is_inside),
        sdepth=jnp.where(sss_enter, sss_sdepth, 0.0),
    )

    # --- Branch 2: refractive (interactions.h:230-310) ------------------
    fresnel = sampling.schlick_fresnel(direction, normal_n, mat.index_of_refraction)
    transmit_pick = u[:, 0] < (1.0 - fresnel)

    ior_eff = jnp.where(
        is_inside, mat.index_of_refraction, 1.0 / jnp.maximum(mat.index_of_refraction, 1e-6)
    )
    cos_nd = vm.dot(normal_n, direction)
    k = 1.0 - ior_eff * ior_eff * (1.0 - cos_nd * cos_nd)
    will_reflect_internally = k < 0.0  # "angle < 0" test (interactions.h:248-250)

    mirror_dir = vm.normalize(vm.reflect(direction, normal_n))
    if softness > 0.0:
        cone = sampling.rand_spherical_vec(0.02, u[:, 3], u[:, 4])
        soft_mirror = sampling.rotate_cone_sample(mirror_dir, cone)
    else:
        soft_mirror = mirror_dir

    refract_dir = vm.refract(direction, normal_n, ior_eff)
    if softness > 0.0:
        cone2 = sampling.rand_spherical_vec(0.02, u[:, 3], u[:, 4])
        refract_dir_j = sampling.rotate_cone_sample(vm.normalize(refract_dir), cone2)
    else:
        refract_dir_j = refract_dir

    # TIR sub-branch: probabilistic reflect vs diffuse
    tir_reflect = u[:, 5] < mat.has_reflective
    tir_dir = jnp.where(tir_reflect[:, None], soft_mirror, diffuse_dir)
    tir_origin = point + normal_n * 1e-5

    # Refract sub-branch: probabilistic refract vs diffuse
    do_refract = u[:, 6] < mat.has_refractive
    refr_dir = jnp.where(do_refract[:, None], refract_dir_j, diffuse_dir)
    refr_origin = jnp.where(
        do_refract[:, None], point - normal_n * 1e-3, point + normal_n * 1e-5
    )
    refr_inside = jnp.where(do_refract, ~is_inside, is_inside)

    transmit_dir = jnp.where(will_reflect_internally[:, None], tir_dir, refr_dir)
    transmit_origin = jnp.where(
        will_reflect_internally[:, None], tir_origin, refr_origin
    )
    transmit_inside = jnp.where(will_reflect_internally, is_inside, refr_inside)

    # Fresnel-reflect branch (interactions.h:304-308)
    fres_dir = mirror_dir
    fres_origin = point + normal_n * 1e-5

    refractive_res = ScatterResult(
        origin=jnp.where(transmit_pick[:, None], transmit_origin, fres_origin),
        direction=jnp.where(transmit_pick[:, None], transmit_dir, fres_dir),
        is_inside=jnp.where(transmit_pick, transmit_inside, False),
        sdepth=jnp.zeros_like(u[:, 0]),
    )

    # --- Branch 3: reflective (interactions.h:312-339) ------------------
    do_mirror = u[:, 0] < mat.has_reflective
    reflective_res = ScatterResult(
        origin=jnp.where(do_mirror[:, None], point + normal_n * 1e-4, diffuse_origin),
        direction=jnp.where(do_mirror[:, None], soft_mirror, diffuse_dir),
        is_inside=jnp.where(do_mirror, False, is_inside),
        sdepth=jnp.zeros_like(u[:, 0]),
    )

    # --- Branch 4: diffuse (interactions.h:340-357) ---------------------
    diffuse_res = ScatterResult(
        origin=diffuse_origin,
        direction=diffuse_dir,
        is_inside=jnp.zeros_like(is_inside),
        sdepth=jnp.zeros_like(u[:, 0]),
    )

    # --- Compose the priority chain -------------------------------------
    has_sss = jnp.any(mat.transmittance > 0.0, axis=-1)
    has_refr = mat.has_refractive != 0.0
    has_refl = mat.has_reflective != 0.0

    def pick(cond, a: ScatterResult, b: ScatterResult) -> ScatterResult:
        return ScatterResult(
            origin=jnp.where(cond[:, None], a.origin, b.origin),
            direction=jnp.where(cond[:, None], a.direction, b.direction),
            is_inside=jnp.where(cond, a.is_inside, b.is_inside),
            sdepth=jnp.where(cond, a.sdepth, b.sdepth),
        )

    out = pick(has_refl, reflective_res, diffuse_res)
    out = pick(has_refr, refractive_res, out)
    out = pick(has_sss, sss_res, out)
    return out

"""Ray–primitive intersection tests, batched over rays.

TPU-native re-design of src/intersections.h. The CUDA versions are
per-thread scalar routines with out-params; here each test maps ``[N]``
rays against ``[G]`` primitives as dense ``[N, G]`` broadcasts (the VPU
sees full 8x128 tiles), and the nearest hit is a masked min-reduction —
replacing the reference's sequential ``if (t > 0 && t < t_min)`` loop
(pathtrace.cu:462-483).

Conventions: a miss is encoded as t = +BIG (not the reference's -1) so
min-reductions need no special casing; ``hit = t < BIG``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.scene.structs import GEOM_CUBE, GEOM_SPHERE

BIG = 1e30


class Hit(NamedTuple):
    """Nearest-hit record — SoA ShadeableIntersection
    (reference: sceneStructs.h:80-85) plus the hit point."""

    t: jax.Array  # [N] f32, BIG = miss
    point: jax.Array  # [N, 3]
    normal: jax.Array  # [N, 3]
    material_id: jax.Array  # [N] int32
    outside: jax.Array  # [N] bool


def _min_hit(a: Hit, b: Hit) -> Hit:
    """Elementwise nearest-of-two-hits merge."""
    take_a = a.t <= b.t
    return Hit(
        t=jnp.where(take_a, a.t, b.t),
        point=jnp.where(take_a[:, None], a.point, b.point),
        normal=jnp.where(take_a[:, None], a.normal, b.normal),
        material_id=jnp.where(take_a, a.material_id, b.material_id),
        outside=jnp.where(take_a, a.outside, b.outside),
    )


def miss_hit(n: int) -> Hit:
    return Hit(
        t=jnp.full((n,), BIG, jnp.float32),
        point=jnp.zeros((n, 3), jnp.float32),
        normal=jnp.zeros((n, 3), jnp.float32),
        material_id=jnp.full((n,), -1, jnp.int32),
        outside=jnp.ones((n,), jnp.bool_),
    )


# ---------------------------------------------------------------------------
# Analytic geoms: unit cube / unit sphere under affine transforms
# ---------------------------------------------------------------------------


def _box_test(q_origin, q_dir, transform):
    """Slab test vs the centered unit cube in object space.

    Mirrors boxIntersectionTest (reference: intersections.h:107-149)
    including its quirks: the object-space direction is re-normalized, the
    entry slab must have ta > 0 to count toward tmin, and an inside ray
    (tmin <= 0) reports the exit face with outside=False. Normals are
    pushed through ``transform`` (not inverse-transpose — reference
    behavior, exact for the rigid+scale transforms the parser builds).

    q_origin/q_dir: [N, G, 3] object-space rays; transform: [G, 4, 4].
    Returns (t_world_distance [N,G], point [N,G,3], normal [N,G,3], outside).
    """
    # The reference divides by zero on axis-parallel rays and leans on
    # IEEE inf semantics (intersections.h:118-120). That is forward-correct
    # except exactly on a slab boundary, and it poisons reverse-mode AD
    # (inf * 0 cotangents). Parallel axes are handled explicitly instead.
    par = jnp.abs(q_dir) < 1e-12
    inv_d = 1.0 / jnp.where(par, 1.0, q_dir)
    t1 = (-0.5 - q_origin) * inv_d
    t2 = (0.5 - q_origin) * inv_d
    inside_slab = (q_origin >= -0.5) & (q_origin <= 0.5)
    ta = jnp.where(
        par, jnp.where(inside_slab, -BIG, BIG), jnp.minimum(t1, t2)
    )
    tb = jnp.where(
        par, jnp.where(inside_slab, BIG, -BIG), jnp.maximum(t1, t2)
    )
    # Per-axis candidate normal sign: +1 if t2 < t1 else -1 (entering face).
    n_sign = jnp.where(t2 < t1, 1.0, -1.0)

    ta_valid = jnp.where(ta > 0, ta, -BIG)
    tmin = jnp.max(ta_valid, axis=-1)
    axis_min = jnp.argmax(ta_valid, axis=-1)
    tmax = jnp.min(tb, axis=-1)
    axis_max = jnp.argmin(tb, axis=-1)

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    # Miss lanes carry ±BIG slab parameters; zero them so the hit point
    # stays bounded (the masked-sum reduction in intersect_geoms
    # multiplies miss lanes by 0, and 0 * inf would be NaN).
    t_obj = jnp.where(hit, jnp.where(inside, tmax, tmin), 0.0)
    axis = jnp.where(inside, axis_max, axis_min)
    outside = hit & ~inside

    # The reference uses the same per-axis sign (+1 if t2 < t1 else -1)
    # for both entry and exit faces (intersections.h:124-135), which makes
    # the exit-face normal point back inward — i.e. normals flip toward
    # the ray when it starts inside. Faithful and physically sensible.
    #
    # Selection is arithmetic (one-hot compare), NOT eye3[axis] /
    # take_along_axis: a data-dependent gather over a length-3 axis
    # lowers to a serialization pathology on TPU (profiled at 1.7 s for
    # [640k, 6] lanes — 55% of a full no-mesh iteration; exp/
    # prof_nomesh.py). The compare+multiply form fuses into the
    # surrounding elementwise work for free.
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, axis.shape + (3,), axis.ndim)
        == axis[..., None]
    ).astype(q_origin.dtype)
    sign = jnp.sum(n_sign * onehot, axis=-1, keepdims=True)
    n_obj = onehot * sign

    p_obj = q_origin + t_obj[..., None] * q_dir
    p_world = vm.transform_point(transform[None, :, :, :], p_obj)
    n_world = vm.normalize(vm.transform_vector(transform[None, :, :, :], n_obj))
    return hit, p_world, n_world, outside


def _sphere_test(q_origin, q_dir, transform, inv_transpose):
    """Unit-sphere (radius 0.5) quadratic in object space.

    Mirrors sphereIntersectionTest (reference: intersections.h:161-203):
    normal via inverse-transpose, flipped when the ray starts inside.
    """
    radius = 0.5
    v_dot_d = vm.dot(q_origin, q_dir)
    radicand = v_dot_d * v_dot_d - (vm.dot(q_origin, q_origin) - radius * radius)
    has_root = radicand >= 0
    # Double-where: sqrt must never see the no-root branch even with a
    # zero cotangent — sqrt'(0) = inf makes 0 * inf = NaN in reverse mode.
    sq = jnp.sqrt(jnp.where(has_root, jnp.maximum(radicand, 1e-12), 1.0))
    sq = jnp.where(has_root, sq, 0.0)
    t1 = -v_dot_d + sq
    t2 = -v_dot_d - sq
    both_neg = (t1 < 0) & (t2 < 0)
    both_pos = (t1 > 0) & (t2 > 0)
    outside = both_pos
    hit = has_root & ~both_neg
    # Zero t on miss lanes (see _box_test: keeps the masked-sum bounded).
    t_obj = jnp.where(
        hit, jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2)), 0.0
    )

    p_obj = q_origin + t_obj[..., None] * q_dir
    p_world = vm.transform_point(transform[None, :, :, :], p_obj)
    n_world = vm.normalize(vm.transform_vector(inv_transpose[None, :, :, :], p_obj))
    n_world = jnp.where(outside[..., None], n_world, -n_world)
    return hit, p_world, n_world, outside


def intersect_geoms(origin, direction, geoms) -> Hit:
    """Nearest hit of [N] rays against all analytic geoms.

    Replaces the per-thread geom loop in pathTraceOneBounce
    (reference: pathtrace.cu:461-484) with one [N, G] broadcast; the
    nearest hit is a min-reduction over the geom axis. Like the
    reference, t is the *world-space distance* |origin - point| (both
    box and sphere tests return glm::length(r.origin - intersectionPoint)).
    """
    n = origin.shape[0]
    g = geoms.type.shape[0]
    if g == 0:
        return miss_hit(n)

    inv = jnp.asarray(geoms.inverse_transform)  # [G, 4, 4]
    tr = jnp.asarray(geoms.transform)
    inv_t = jnp.asarray(geoms.inv_transpose)
    gtype = jnp.asarray(geoms.type)
    mat_id = jnp.asarray(geoms.material_id)

    # Object-space rays: [N, G, 3]
    q_o = vm.transform_point(inv[None, :, :, :], origin[:, None, :])
    q_d = vm.normalize(vm.transform_vector(inv[None, :, :, :], direction[:, None, :]))

    box_hit, box_p, box_n, box_out = _box_test(q_o, q_d, tr)
    sph_hit, sph_p, sph_n, sph_out = _sphere_test(q_o, q_d, tr, inv_t)

    is_box = (gtype == GEOM_CUBE)[None, :]
    hit = jnp.where(is_box, box_hit, sph_hit)
    point = jnp.where(is_box[..., None], box_p, sph_p)
    normal = jnp.where(is_box[..., None], box_n, sph_n)
    outside = jnp.where(is_box, box_out, sph_out)

    t = jnp.where(hit, vm.safe_norm(point - origin[:, None, :]), BIG)

    # Nearest over the geom axis. Miss lanes are sanitized to zeros:
    # the un-hit branches carry huge/garbage positions (t_obj ~ ±BIG
    # through the transform) that would otherwise overflow downstream
    # math and poison reverse-mode AD.
    #
    # The winner is selected by a first-true mask + masked sum, NOT by
    # argmin + [rows, best] gathers: each of those per-lane gathers over
    # the tiny geom axis cost ~140 ms at 640k lanes on TPU (profiled,
    # exp/prof_nomesh.py) where the dense mask-reduce fuses into the
    # tests themselves. Ties resolve to the lowest geom index, exactly
    # like argmin (and the reference's sequential `t < t_min` loop,
    # pathtrace.cu:462-483, which keeps the FIRST of equal hits).
    t_best = jnp.min(t, axis=1)
    is_min = t == t_best[:, None]
    first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
    firstf = first.astype(t.dtype)
    is_hit = t_best < BIG
    hitf = is_hit.astype(t.dtype)[:, None]
    return Hit(
        t=t_best,
        point=jnp.sum(point * firstf[..., None], axis=1) * hitf,
        normal=jnp.sum(normal * firstf[..., None], axis=1) * hitf,
        material_id=jnp.where(
            is_hit, jnp.sum(mat_id[None, :] * first, axis=1), -1
        ),
        outside=jnp.any(outside & first, axis=1),
    )


# ---------------------------------------------------------------------------
# Triangles: Möller–Trumbore
# ---------------------------------------------------------------------------


def moller_trumbore(origin, direction, v0, v1, v2, cull_backface: bool = True):
    """Möller–Trumbore over a [N_rays] x [T] broadcast.

    Matches the vendored glm::intersectRayTriangle
    (reference: external/include/glm/gtx/intersect.inl): back-face culled
    (det < eps -> miss), t >= 0 accepted, barycentrics (u toward v1,
    v toward v2).

    origin/direction: [N, 3]; v0/v1/v2: [T, 3].
    Returns (t [N, T] with BIG=miss, u [N, T], v [N, T]).
    """
    e1 = v1 - v0  # [T, 3]
    e2 = v2 - v0
    p = jnp.cross(direction[:, None, :], e2[None, :, :])  # [N, T, 3]
    a = jnp.sum(e1[None, :, :] * p, axis=-1)  # [N, T]
    if cull_backface:
        valid = a > 1.19e-7  # float eps, as glm
    else:
        valid = jnp.abs(a) > 1.19e-7
    f = 1.0 / jnp.where(valid, a, 1.0)
    s = origin[:, None, :] - v0[None, :, :]  # [N, T, 3]
    u = f * jnp.sum(s * p, axis=-1)
    q = jnp.cross(s, e1[None, :, :])
    v = f * jnp.sum(direction[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[None, :, :] * q, axis=-1)
    ok = valid & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return jnp.where(ok, t, BIG), u, v


def interpolate_tri_hit(origin, direction, t, u, v, n0, n1, n2):
    """Barycentric normal interpolation + offset hit point.

    Mirrors the leaf hit bookkeeping in the traversal kernels
    (reference: pathtrace.cu:981-1007): norm = (1-u-v)*n0 + u*n1 + v*n2,
    hit point offset by +normal*1e-4.
    """
    w = 1.0 - u - v
    normal = vm.normalize(
        w[..., None] * n0 + u[..., None] * n1 + v[..., None] * n2
    )
    point = origin + t[..., None] * direction + normal * 1e-4
    return point, normal


# ---------------------------------------------------------------------------
# AABB slab tests
# ---------------------------------------------------------------------------


def intersect_aabb(origin, direction, bb_min, bb_max):
    """Branchless slab test, broadcast over rays x boxes.

    Mirrors intersectBbox / intersectAABBarrays (reference:
    interactions.h:136-165, intersections.h:253-286): returns the entry
    distance dmin; the caller treats ``dmax < 0`` or ``dmin > dmax`` as a
    miss (the reference returns dmax in those cases, which is < dmin or
    negative).

    origin/direction: [..., 3]; bb_min/bb_max broadcastable to [..., 3].
    Returns (hit [...], dist [...]).

    Robustness fix over the reference: an axis-parallel ray whose origin
    sits exactly on a slab boundary yields 0 * inf = NaN in the naive
    formulation (both here and in the CUDA original), silently pruning
    real hits — e.g. the image's exact center column grazing a KD split
    plane. Parallel axes are handled explicitly: inside the slab ->
    (-BIG, +BIG), outside -> forced miss.
    """
    par = jnp.abs(direction) < 1e-12
    inv_d = 1.0 / jnp.where(par, 1.0, direction)
    t1 = (bb_min - origin) * inv_d
    t2 = (bb_max - origin) * inv_d
    inside_slab = (origin >= bb_min) & (origin <= bb_max)
    lo = jnp.where(par, jnp.where(inside_slab, -BIG, BIG), jnp.minimum(t1, t2))
    hi = jnp.where(par, jnp.where(inside_slab, BIG, -BIG), jnp.maximum(t1, t2))
    dmin = jnp.max(lo, axis=-1)
    dmax = jnp.min(hi, axis=-1)
    hit = (dmax >= 0) & (dmin <= dmax)
    return hit, jnp.where(hit, dmin, dmax)

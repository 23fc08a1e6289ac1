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
    (reference: sceneStructs.h:80-85) plus the hit point.

    ``point``/``normal`` are channel-split ``vm.V3`` of [N] arrays (the
    TPU-fast layout — see vecmath.py); use ``vm.v3_to_rows`` for an
    [N, 3] view at module boundaries."""

    t: jax.Array  # [N] f32, BIG = miss
    point: vm.V3  # V3 of [N]
    normal: vm.V3  # V3 of [N]
    material_id: jax.Array  # [N] int32
    outside: jax.Array  # [N] bool


def _min_hit(a: Hit, b: Hit) -> Hit:
    """Elementwise nearest-of-two-hits merge."""
    take_a = a.t <= b.t
    return Hit(
        t=jnp.where(take_a, a.t, b.t),
        point=vm.wherev(take_a, a.point, b.point),
        normal=vm.wherev(take_a, a.normal, b.normal),
        material_id=jnp.where(take_a, a.material_id, b.material_id),
        outside=jnp.where(take_a, a.outside, b.outside),
    )


def miss_hit(n: int) -> Hit:
    return Hit(
        t=jnp.full((n,), BIG, jnp.float32),
        point=vm.v3_zeros(n),
        normal=vm.v3_zeros(n),
        material_id=jnp.full((n,), -1, jnp.int32),
        outside=jnp.ones((n,), jnp.bool_),
    )


# ---------------------------------------------------------------------------
# Analytic geoms: unit cube / unit sphere under affine transforms
# ---------------------------------------------------------------------------


def _xform_point(m, p: vm.V3) -> vm.V3:
    """Apply one [4, 4] matrix (scalar entries) to a V3 batch (w=1)."""
    return vm.V3(
        m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3],
        m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3],
        m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3],
    )


def _xform_vector(m, v: vm.V3) -> vm.V3:
    """Apply one [4, 4] matrix to a V3 batch of directions (w=0)."""
    return vm.V3(
        m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
        m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
        m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z,
    )


def _box_test_g(qo: vm.V3, qd: vm.V3, tr):
    """Channel-split slab test vs the centered unit cube, ONE geom.

    Mirrors boxIntersectionTest (reference: intersections.h:107-149)
    including its quirks: the entry slab must have ta > 0 to count
    toward tmin, and an inside ray (tmin <= 0) reports the exit face
    with outside=False. Normals are pushed through ``tr`` (not
    inverse-transpose — reference behavior, exact for the rigid+scale
    transforms the parser builds). Axis-parallel rays are handled
    explicitly (the reference's IEEE-inf division poisons reverse-mode
    AD). Argmax/argmin over the 3 axes become first-true compare chains
    (identical tie-breaks).

    qo/qd: object-space ray batch as V3 of [N]; tr: [4, 4].
    Returns (hit [N], p_world V3, n_world V3, outside [N]).
    """
    ta = []
    tb = []
    nsign = []
    for o_a, d_a in ((qo.x, qd.x), (qo.y, qd.y), (qo.z, qd.z)):
        par = jnp.abs(d_a) < 1e-12
        inv_d = 1.0 / jnp.where(par, 1.0, d_a)
        t1 = (-0.5 - o_a) * inv_d
        t2 = (0.5 - o_a) * inv_d
        inside_slab = (o_a >= -0.5) & (o_a <= 0.5)
        ta.append(jnp.where(par, jnp.where(inside_slab, -BIG, BIG),
                            jnp.minimum(t1, t2)))
        tb.append(jnp.where(par, jnp.where(inside_slab, BIG, -BIG),
                            jnp.maximum(t1, t2)))
        nsign.append(jnp.where(t2 < t1, 1.0, -1.0))

    tav = [jnp.where(t > 0, t, -BIG) for t in ta]
    tmin = jnp.maximum(jnp.maximum(tav[0], tav[1]), tav[2])
    # first-max / first-min one-hots (same tie-break as argmax/argmin)
    en_x = (tav[0] >= tav[1]) & (tav[0] >= tav[2])
    en_y = ~en_x & (tav[1] >= tav[2])
    en_z = ~en_x & ~en_y
    tmax = jnp.minimum(jnp.minimum(tb[0], tb[1]), tb[2])
    ex_x = (tb[0] <= tb[1]) & (tb[0] <= tb[2])
    ex_y = ~ex_x & (tb[1] <= tb[2])
    ex_z = ~ex_x & ~ex_y

    hit = (tmax >= tmin) & (tmax > 0)
    inside = tmin <= 0
    t_obj = jnp.where(hit, jnp.where(inside, tmax, tmin), 0.0)
    oh_x = jnp.where(inside, ex_x, en_x)
    oh_y = jnp.where(inside, ex_y, en_y)
    oh_z = jnp.where(inside, ex_z, en_z)
    outside = hit & ~inside

    # Same per-axis sign for entry and exit faces (reference
    # intersections.h:124-135): exit normals point back inward.
    sign = jnp.where(oh_x, nsign[0], jnp.where(oh_y, nsign[1], nsign[2]))
    n_obj = vm.V3(
        jnp.where(oh_x, sign, 0.0),
        jnp.where(oh_y, sign, 0.0),
        jnp.where(oh_z, sign, 0.0),
    )

    p_obj = qo + qd * t_obj
    p_world = _xform_point(tr, p_obj)
    n_world = vm.normalizev(_xform_vector(tr, n_obj))
    return hit, p_world, n_world, outside


def _sphere_test_g(qo: vm.V3, qd: vm.V3, tr, inv_t):
    """Channel-split unit-sphere (radius 0.5) quadratic, ONE geom.

    Mirrors sphereIntersectionTest (reference: intersections.h:161-203):
    normal via inverse-transpose, flipped when the ray starts inside.
    """
    radius = 0.5
    v_dot_d = vm.dotv(qo, qd)
    radicand = v_dot_d * v_dot_d - (vm.dotv(qo, qo) - radius * radius)
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
    t_obj = jnp.where(
        hit, jnp.where(both_pos, jnp.minimum(t1, t2), jnp.maximum(t1, t2)), 0.0
    )

    p_obj = qo + qd * t_obj
    p_world = _xform_point(tr, p_obj)
    n_world = vm.normalizev(_xform_vector(inv_t, p_obj))
    n_world = vm.wherev(outside, n_world, -n_world)
    return hit, p_world, n_world, outside


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
    (reference: pathtrace.cu:461-484). Channel-split redesign (r5): a
    STATIC Python loop over the few analytic geoms, each emitting one
    fused elementwise block over [N] channel arrays, merged
    sequentially with strict-< (keeps the FIRST of equal hits, exactly
    like the reference's sequential ``t < t_min`` loop and the previous
    argmin form). The old [N, G] broadcast held vectors as [N, G, 3]
    tiles whose masked reductions cost ~1.3 ms/bounce at 640k rays;
    this form is pure [N]-elementwise and fuses end-to-end.

    When ``geoms.type`` is concrete (numpy — the production path via
    _hoist_tables' small-leaf rule) only the matching test is emitted
    per geom; with traced types both tests run, selected per geom.

    Like the reference, t is the *world-space distance*
    |origin - point| (both tests return glm::length(r.origin - point)).

    ``origin``/``direction``: V3 of [N] or [N, 3] arrays.
    """
    if not isinstance(origin, vm.V3):
        origin = vm.v3_from_rows(jnp.asarray(origin))
    if not isinstance(direction, vm.V3):
        direction = vm.v3_from_rows(jnp.asarray(direction))
    n = origin.x.shape[0]
    g = geoms.type.shape[0]
    if g == 0:
        return miss_hit(n)

    import numpy as _np

    inv = geoms.inverse_transform  # [G, 4, 4]
    tr = geoms.transform
    inv_t = geoms.inv_transpose
    types_concrete = isinstance(geoms.type, _np.ndarray)
    gtype = geoms.type if types_concrete else jnp.asarray(geoms.type)
    mat_id = geoms.material_id

    best = miss_hit(n)
    for gi in range(g):
        inv_g = jnp.asarray(inv[gi])
        tr_g = jnp.asarray(tr[gi])
        qo = _xform_point(inv_g, origin)
        qd = vm.normalizev(_xform_vector(inv_g, direction))

        if types_concrete:
            if int(gtype[gi]) == GEOM_CUBE:
                hit, p, nrm, outs = _box_test_g(qo, qd, tr_g)
            else:
                hit, p, nrm, outs = _sphere_test_g(qo, qd, tr_g,
                                                   jnp.asarray(inv_t[gi]))
        else:
            bh, bp, bn, bo = _box_test_g(qo, qd, tr_g)
            sh, sp, sn, so = _sphere_test_g(qo, qd, tr_g,
                                            jnp.asarray(inv_t[gi]))
            is_box = gtype[gi] == GEOM_CUBE
            hit = jnp.where(is_box, bh, sh)
            p = vm.wherev(is_box, bp, sp)
            nrm = vm.wherev(is_box, bn, sn)
            outs = jnp.where(is_box, bo, so)

        t_g = jnp.where(hit, vm.safe_normv(p - origin), BIG)
        # Miss lanes sanitize to zeros (huge t_obj positions would
        # overflow downstream math and poison reverse-mode AD).
        hf = hit.astype(t_g.dtype)
        upd = t_g < best.t
        best = Hit(
            t=jnp.where(upd, t_g, best.t),
            point=vm.wherev(upd, p * hf, best.point),
            normal=vm.wherev(upd, nrm * hf, best.normal),
            material_id=jnp.where(upd, jnp.asarray(mat_id[gi], jnp.int32),
                                  best.material_id),
            outside=jnp.where(upd, outs, best.outside),
        )
    return best


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

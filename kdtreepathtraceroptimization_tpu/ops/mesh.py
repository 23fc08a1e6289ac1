"""Triangle-mesh intersection — brute force with chunked streaming.

Re-design of the brute-force OBJ loop in pathTraceOneBounce (reference:
src/pathtrace.cu:487-628): the CUDA kernel walks every triangle per
thread; here triangles stream through in fixed-size chunks held in VMEM
while the running nearest-hit is carried through a ``lax.fori_loop`` —
this is the TPU analog of the reference's brute-force and
bounding-box-culled modes, and the correctness oracle for the KD path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import intersect as isect
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG, Hit


class TriHit(NamedTuple):
    """Best triangle hit per ray."""

    t: jax.Array  # [N] f32 (BIG = miss)
    tri: jax.Array  # [N] int32 triangle index (-1 = miss)
    u: jax.Array  # [N]
    v: jax.Array  # [N]


def _pad_tris(n_tris: int, chunk: int) -> int:
    return (n_tris + chunk - 1) // chunk * chunk


def intersect_mesh_brute(
    origin: jax.Array,
    direction: jax.Array,
    mesh,
    chunk: int = 512,
    use_bbox: bool = True,
    t_max: Optional[jax.Array] = None,
) -> TriHit:
    """Nearest triangle hit, streaming triangle chunks.

    ``use_bbox`` mirrors the reference's per-shape AABB cull
    (pathtrace.cu:497-507 with the 0.01 pad): rays that miss every
    shape's padded AABB skip triangle work entirely (lane-masked).
    """
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    n = origin.shape[0]
    v0 = jnp.asarray(mesh.v0)
    v1 = jnp.asarray(mesh.v1)
    v2 = jnp.asarray(mesh.v2)
    n_tris = v0.shape[0]
    padded = _pad_tris(n_tris, chunk)
    if padded != n_tris:
        pad = padded - n_tris
        # Degenerate padding triangles never hit (all vertices equal).
        v0 = jnp.concatenate([v0, jnp.zeros((pad, 3), v0.dtype)])
        v1 = jnp.concatenate([v1, jnp.zeros((pad, 3), v1.dtype)])
        v2 = jnp.concatenate([v2, jnp.zeros((pad, 3), v2.dtype)])

    if use_bbox:
        bb_min = jnp.asarray(mesh.shape_bbox_min) - 0.01
        bb_max = jnp.asarray(mesh.shape_bbox_max) + 0.01
        hit_any, _ = isect.intersect_aabb(
            origin[:, None, :], direction[:, None, :], bb_min[None], bb_max[None]
        )
        ray_mask = jnp.any(hit_any, axis=1)
    else:
        ray_mask = jnp.ones((n,), jnp.bool_)

    n_chunks = padded // chunk

    def body(c, carry):
        best_t, best_tri, best_u, best_v = carry
        start = c * chunk
        cv0 = jax.lax.dynamic_slice_in_dim(v0, start, chunk)
        cv1 = jax.lax.dynamic_slice_in_dim(v1, start, chunk)
        cv2 = jax.lax.dynamic_slice_in_dim(v2, start, chunk)
        t, u, v = isect.moller_trumbore(origin, direction, cv0, cv1, cv2)
        t = jnp.where(ray_mask[:, None], t, BIG)
        local_best = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        lt = t[rows, local_best]
        lu = u[rows, local_best]
        lv = v[rows, local_best]
        better = lt < best_t
        return (
            jnp.where(better, lt, best_t),
            jnp.where(better, start + local_best.astype(jnp.int32), best_tri),
            jnp.where(better, lu, best_u),
            jnp.where(better, lv, best_v),
        )

    init = (
        jnp.full((n,), BIG, jnp.float32) if t_max is None else t_max,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, n_chunks, body, init)
    # The selection is discrete; gradients come from refine_tri_hit.
    return jax.lax.stop_gradient(TriHit(t=best_t, tri=best_tri, u=best_u, v=best_v))


def refine_tri_hit(origin, direction, tri_idx, mesh):
    """Differentiably recompute (t, u, v) for an already-selected triangle.

    The traversal loops (lax.while_loop / fori_loop) are not
    reverse-differentiable and shouldn't be — the *choice* of nearest
    triangle is discrete. This is the standard detached-sampling
    estimator: the index is stop-gradient, but t/u/v are re-evaluated
    with one Möller–Trumbore outside the loop so gradients flow to
    vertices, ray origin and direction. (Differentiability is a new
    capability over the reference — SURVEY.md §7 step 7.)
    """
    tri = jax.lax.stop_gradient(jnp.maximum(tri_idx, 0))
    v0 = jnp.asarray(mesh.v0)[tri]
    v1 = jnp.asarray(mesh.v1)[tri]
    v2 = jnp.asarray(mesh.v2)[tri]
    return _refine_tri_hit_verts(origin, direction, v0, v1, v2)


def _refine_tri_hit_verts(origin, direction, v0, v1, v2):
    """refine_tri_hit on pre-gathered per-lane vertices."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(direction, e2)
    a = jnp.sum(e1 * p, axis=-1)
    # 1/det blows up at silhouette-grazing hits (the classic
    # differentiable-rendering singularity): clamp |det| so gradients
    # stay large-but-bounded instead of overflowing to inf/NaN when the
    # loss sums many of them. Forward values change only for hits with
    # |det| < 1e-6 — beyond-grazing angles with no visual contribution.
    safe = jnp.abs(a) > 1e-12
    a_clamped = jnp.where(a >= 0, 1.0, -1.0) * jnp.maximum(jnp.abs(a), 1e-6)
    f = 1.0 / jnp.where(safe, a_clamped, 1.0)
    s = origin - v0
    u = f * jnp.sum(s * p, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    return t, u, v


def _refine_tri_hit_verts_v(origin: vm.V3, direction: vm.V3,
                            v0: vm.V3, v1: vm.V3, v2: vm.V3):
    """Channel-split twin of _refine_tri_hit_verts (same math/clamps)."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = vm.crossv(direction, e2)
    a = vm.dotv(e1, p)
    safe = jnp.abs(a) > 1e-12
    a_clamped = jnp.where(a >= 0, 1.0, -1.0) * jnp.maximum(jnp.abs(a), 1e-6)
    f = 1.0 / jnp.where(safe, a_clamped, 1.0)
    s = origin - v0
    u = f * vm.dotv(s, p)
    q = vm.crossv(s, e1)
    v = f * vm.dotv(direction, q)
    t = f * vm.dotv(e2, q)
    return t, u, v


_T_TILE = 4096


def _rows_to_cols_pallas(rows: jax.Array) -> jax.Array:
    """[N, C] -> [C, N] via a tiled Pallas transpose (TPU only).

    Turning a row-major gather result into C usable channel arrays via
    XLA strided reads costs ~7 ms at 640k x 19 (the cross-lane relayout
    is re-fused into every consumer); this kernel does the relayout in
    one pass at ~bandwidth (exp/trihit_micro2.py: extraction goes from
    +7.8 ms over the gather floor to ~free)."""
    from jax.experimental import pallas as pl

    n, c = rows.shape
    tile = _T_TILE
    npad = -(-n // tile) * tile
    if npad != n:
        rows = jnp.concatenate(
            [rows, jnp.zeros((npad - n, c), rows.dtype)])

    def kern(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    out = pl.pallas_call(
        kern,
        grid=(npad // tile,),
        in_specs=[pl.BlockSpec((tile, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((c, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c, npad), rows.dtype),
    )(rows)
    return out[:, :n] if npad != n else out


def _cols_to_rows_pallas(cols: jax.Array) -> jax.Array:
    """[C, N] -> [N, C]: the transpose-back twin (used as the VJP)."""
    from jax.experimental import pallas as pl

    c, n = cols.shape
    tile = _T_TILE
    npad = -(-n // tile) * tile
    if npad != n:
        cols = jnp.concatenate(
            [cols, jnp.zeros((c, npad - n), cols.dtype)], axis=1)

    def kern(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    out = pl.pallas_call(
        kern,
        grid=(npad // tile,),
        in_specs=[pl.BlockSpec((c, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, c), cols.dtype),
    )(cols)
    return out[:n] if npad != n else out


@jax.custom_vjp
def _transpose_rows(rows: jax.Array) -> jax.Array:
    return _rows_to_cols_pallas(rows)


def _transpose_rows_fwd(rows):
    return _transpose_rows(rows), None


def _transpose_rows_bwd(_, ct):
    # The exact adjoint of a transpose is the transpose back; gradients
    # w.r.t. mesh vertices keep flowing through the row gather upstream.
    return (_cols_to_rows_pallas(ct),)


_transpose_rows.defvjp(_transpose_rows_fwd, _transpose_rows_bwd)


def tri_hit_to_hit(origin, direction, tri_hit: TriHit, mesh) -> Hit:
    """Expand a TriHit into a full Hit record (normal interpolation +
    offset point, reference: pathtrace.cu:981-1007). t/u/v are
    differentiably recomputed from the winning triangle (refine_tri_hit),
    so the loop-computed values only pick the winner — and gradients
    w.r.t. ``mesh.v0/v1/v2`` flow through the packed-row gather, which
    is how the production (pairs) intersector is differentiable.

    All per-triangle fields are pulled through ONE [T, 19]-row gather:
    a TPU gather costs ~12 ns per ROW regardless of width (measured,
    exp/gather_micro.py), so seven separate field gathers at 640k lanes
    were ~30 ms/bounce where the packed row is ~8 ms. The packed table
    is built from the SoA fields inside the jit — a [T, 19] concat is
    ~0.1 ms at 100k tris and XLA CSEs it across bounces. Downstream
    math is channel-split (V3 of [N]) — see vecmath.py.

    TPU fast path (exp/trihit_micro2-6.py, v5e, 640k rays x 100k tris):
    the naive expansion costs 20.7 ms/bounce — ~8 ms gather + ~7 ms of
    [N,19]->19x[N] strided channel relayout + ~5 ms of re-fused reads —
    plus a congestion penalty from miss lanes all gathering row 0 (a
    65%-same-row/35%-random mix measures 12 ms vs 9.3 when misses are
    spread over iota%T). The fast path (miss->iota index spread +
    optimization_barrier'd gather + one Pallas tile-transpose) runs the
    whole expansion at 8.0 ms — the random-gather floor. Miss lanes
    gather live rows but every miss-lane output is masked, so results
    and cotangents are unchanged (zeros flow back to the extra rows).

    ``origin``/``direction``: V3 of [N] or [N, 3].
    """
    if not isinstance(origin, vm.V3):
        origin = vm.v3_from_rows(jnp.asarray(origin))
    if not isinstance(direction, vm.V3):
        direction = vm.v3_from_rows(jnp.asarray(direction))
    n = origin.x.shape[0]
    is_hit = tri_hit.tri >= 0
    on_tpu = jax.default_backend() == "tpu"
    nt = int(jnp.asarray(mesh.v0).shape[0])
    if on_tpu:
        iota = jax.lax.iota(jnp.int32, n) % jnp.int32(nt)
        tri = jnp.where(is_hit, tri_hit.tri, iota)
    else:
        tri = jnp.maximum(tri_hit.tri, 0)

    packed = jnp.concatenate(
        [
            jnp.asarray(mesh.v0), jnp.asarray(mesh.v1), jnp.asarray(mesh.v2),
            jnp.asarray(mesh.n0), jnp.asarray(mesh.n1), jnp.asarray(mesh.n2),
            jnp.asarray(mesh.material_id).astype(jnp.float32)[:, None],
        ],
        axis=1,
    )  # [T, 19]
    rowst = packed[jax.lax.stop_gradient(tri)]

    if on_tpu:
        rowst = jax.lax.optimization_barrier(rowst)
        colst = _transpose_rows(rowst)

        def col3(j):
            return vm.V3(colst[j], colst[j + 1], colst[j + 2])

        def col1(j):
            return colst[j]
    else:
        def col3(j):
            return vm.V3(rowst[:, j], rowst[:, j + 1], rowst[:, j + 2])

        def col1(j):
            return rowst[:, j]

    v0, v1, v2 = col3(0), col3(3), col3(6)
    n0, n1, n2 = col3(9), col3(12), col3(15)
    mat_id = col1(18).astype(jnp.int32)

    t, u, v = _refine_tri_hit_verts_v(origin, direction, v0, v1, v2)
    # Guard: if the refined eval disagrees wildly (degenerate padding
    # triangle on a miss lane), fall back to the loop values.
    t = jnp.where(is_hit, t, BIG)

    w = 1.0 - u - v
    normal = vm.normalizev(n0 * w + n1 * u + n2 * v)
    point = origin + direction * t + normal * 1e-4
    zero = jnp.zeros_like(t)
    zv = vm.V3(zero, zero, zero)
    return Hit(
        t=t,
        point=vm.wherev(is_hit, point, zv),
        normal=vm.wherev(is_hit, normal, zv),
        material_id=jnp.where(is_hit, mat_id, -1),
        outside=jnp.ones((n,), jnp.bool_),
    )

"""MXU-form brute-force triangle intersection.

The reference's brute-force mode walks every triangle per CUDA thread
with scalar Möller–Trumbore (pathTraceOneBounce, pathtrace.cu:487-628).
The TPU has a 128x128 systolic array sitting idle during intersection —
and Möller–Trumbore is secretly a *matmul*: writing ``det[x,y,z]`` for
the scalar triple product, the four quantities the test needs are

    a      = e1.(d x e2)            = -(d . n)                n  = e1 x e2
    t_num  = e2.(s x e1)            =   o . n - c             c  = v0 . n
    u_num  =  s.(d x e2)            =   m . e2 - d . (e2xv0)  m  = o x d
    v_num  =  d.(s x e1)            = -(m . e1) - d . (v0xe1)

(s = o - v0; each line expands det(s,..) = det(o,..) - det(v0,..) and
cycles rows until every term is a dot of a RAY-ONLY vector with a
TRIANGLE-ONLY vector.) So with the 10-feature ray vector

    R = [o, d, m, 1]                               [N, 10]

and a per-triangle weight matrix W [10, 4T] (columns grouped as the
a / t_num / u_num / v_num blocks), ONE matmul R @ W computes every
ray-triangle test in the tile — 2*10 MXU FLOPs per (ray, tri, quantity)
instead of ~60 VPU ops per pair. Validity then needs only comparisons
of the *unnormalized* numerators against ``a`` (a > 0 after backface
culling, so u in [0,1] <=> 0 <= u_num <= a, etc.), and the single
division t = t_num / a happens once per pair (approx reciprocal; the
winning hit is re-evaluated exactly and differentiably by
mesh.refine_tri_hit afterwards).

Two implementations, same math:
- ``intersect_brute_mxu_ref``: plain jnp (einsum) — runs anywhere, the
  correctness oracle and CPU fallback.
- ``intersect_brute_mxu``: fused Pallas TPU kernel — tiles rays x
  triangle blocks, keeps the [RT, 4*TB] product in VMEM, fuses the
  epilogue (mask + t + running min) so nothing [N, T]-shaped ever
  touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit

# glm::intersectRayTriangle backface-cull epsilon (intersect.inl, used
# by the reference at every leaf, e.g. pathtrace.cu:1130).
_CULL_EPS = 1.19e-7


def _scene_center(v0, v1, v2):
    """Bbox center of the triangle soup, used to translate rays and
    triangles toward the origin before building R and W.

    The det-form numerators (t_num = o.n - v0.n etc.) give up classic
    Möller–Trumbore's translation invariance (which forms s = o - v0
    first), so scenes with coordinates far from the origin lose f32
    bits to cancellation inside the matmul. A constant shift of both
    rays and triangles preserves the matmul form and every output
    (a, t, u, v are all translation invariant), and restores the
    precision of the centered case.
    """
    lo = jnp.minimum(jnp.min(v0, axis=0), jnp.minimum(jnp.min(v1, axis=0),
                                                      jnp.min(v2, axis=0)))
    hi = jnp.maximum(jnp.max(v0, axis=0), jnp.maximum(jnp.max(v1, axis=0),
                                                      jnp.max(v2, axis=0)))
    return 0.5 * (lo + hi)


def ray_features(origin: jax.Array, direction: jax.Array) -> jax.Array:
    """[N, 10] ray feature matrix R = [o, d, o x d, 1]."""
    m = jnp.cross(origin, direction)
    one = jnp.ones((origin.shape[0], 1), origin.dtype)
    return jnp.concatenate([origin, direction, m, one], axis=1)


def tri_weights(v0, v1, v2) -> jax.Array:
    """[10, 4T] triangle weight matrix; columns = [a | t | u | v] blocks.

    Degenerate (all-equal-vertex) padding triangles produce n = 0 and
    therefore a = 0 < cull-eps: they can never win.
    """
    v0 = jnp.asarray(v0, jnp.float32)
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)  # [T, 3]
    c = jnp.sum(v0 * n, axis=1)  # [T]
    e2xv0 = jnp.cross(e2, v0)
    v0xe1 = jnp.cross(v0, e1)
    t_ = v0.shape[0]
    z3 = jnp.zeros((t_, 3), jnp.float32)
    z1 = jnp.zeros((t_, 1), jnp.float32)
    one = jnp.ones((t_, 1), jnp.float32)
    # Each W_q is [T, 10] = [o-part, d-part, m-part, const]; stack and
    # transpose to [10, 4T] with the quantity as the faster axis group.
    w_a = jnp.concatenate([z3, -n, z3, z1], axis=1)
    w_t = jnp.concatenate([n, z3, z3, -c[:, None] * one], axis=1)
    w_u = jnp.concatenate([z3, -e2xv0, e2, z1], axis=1)
    w_v = jnp.concatenate([z3, -v0xe1, -e1, z1], axis=1)
    return jnp.concatenate([w_a, w_t, w_u, w_v], axis=0).T  # [10, 4T]


def _epilogue(prod, tb, t_best):
    """Shared epilogue: [RT, 4*TB] products -> masked t [RT, TB].

    ``t_best`` may be [RT] or a column [RT, 1] (the Pallas kernel keeps
    per-ray state 2-D to avoid Mosaic vector reshapes)."""
    if t_best.ndim == 1:
        t_best = t_best[:, None]
    a = prod[:, 0 * tb:1 * tb]
    tn = prod[:, 1 * tb:2 * tb]
    un = prod[:, 2 * tb:3 * tb]
    vn = prod[:, 3 * tb:4 * tb]
    ok = (
        (a > _CULL_EPS)
        & (un >= 0.0)
        & (vn >= 0.0)
        & (un + vn <= a)
        & (tn >= 0.0)
    )
    t = jnp.where(ok, tn / a, BIG)
    return jnp.where(t < t_best, t, BIG)


def intersect_brute_mxu_ref(origin, direction, v0, v1, v2,
                            t_max=None, block: int = 2048) -> TriHit:
    """jnp reference of the MXU-form test (einsum; XLA already routes
    the contraction to the MXU). Streams triangle blocks through a
    fori_loop like mesh.intersect_mesh_brute."""
    n = origin.shape[0]
    v0 = jnp.asarray(v0, jnp.float32)
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    center = _scene_center(v0, v1, v2)
    origin = jnp.asarray(origin, jnp.float32) - center
    v0, v1, v2 = v0 - center, v1 - center, v2 - center
    t_count = v0.shape[0]
    pad = (-t_count) % block
    if pad:
        z = jnp.zeros((pad, 3), jnp.float32)
        v0 = jnp.concatenate([v0, z])
        v1 = jnp.concatenate([v1, z])
        v2 = jnp.concatenate([v2, z])
    w = tri_weights(v0, v1, v2)  # [10, 4T']
    tp = v0.shape[0]
    # regroup to [T'/B, 10, 4B] so each loop step slices one block
    w = (
        w.reshape(10, 4, tp // block, block)
        .transpose(2, 0, 1, 3)
        .reshape(tp // block, 10, 4 * block)
    )
    r = ray_features(origin, direction)  # [N, 10]

    def body(i, carry):
        bt, btri = carry
        prod = r @ w[i]  # [N, 4B] — MXU
        t = _epilogue(prod, block, bt)
        loc = jnp.argmin(t, axis=1)
        rows = jnp.arange(n)
        lt = t[rows, loc]
        better = lt < bt
        return (
            jnp.where(better, lt, bt),
            jnp.where(better, (i * block + loc).astype(jnp.int32), btri),
        )

    t0 = jnp.full((n,), BIG, jnp.float32) if t_max is None else t_max
    bt, btri = jax.lax.fori_loop(0, tp // block, body, (t0, jnp.full((n,), -1, jnp.int32)))
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    # u/v of the winner are recomputed by mesh.refine_tri_hit.
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _bf_kernel(r_ref, w_ref, t0_ref, bt_ref, btri_ref, *, tb, rt):
    """Grid (ray_tiles, tri_blocks); tri_blocks is the inner (fast)
    dimension, accumulating the running best into the output block.

    Per-ray state (t0/bt/btri) is laid out as COLUMN vectors [n, 1]:
    a (rt, 1) block is legal (minor dim equals the full array dim) and
    every kernel value stays 2-D — [rt, 4tb] products reduce along
    axis 1 (keepdims) straight into [rt, 1] with no vector reshapes,
    which Mosaic cannot relayout. The old (1, rt) per-tile row violated
    the (8k, 128m) block-tiling rule and never compiled on real TPU."""
    import jax.experimental.pallas as pl

    jj = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        bt_ref[:, :] = t0_ref[:, :]
        btri_ref[:, :] = jnp.full((rt, 1), -1, jnp.int32)

    prod = jax.lax.dot_general(
        r_ref[:, :], w_ref[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [RT, 4*TB]
    bt = bt_ref[:, :]  # [rt, 1]
    t = _epilogue(prod, tb, bt)
    loc = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
    lt = jnp.min(t, axis=1, keepdims=True)
    better = lt < bt
    tri_idx = jj * tb + loc
    bt_ref[:, :] = jnp.where(better, lt, bt)
    btri_ref[:, :] = jnp.where(better, tri_idx, btri_ref[:, :])


@functools.partial(jax.jit, static_argnames=("rt", "tb", "interpret"))
def _bf_pallas(r, w, t0, rt: int, tb: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = r.shape[0]
    tp4 = w.shape[1]
    n_tiles = n // rt
    n_blocks = tp4 // (4 * tb)
    # w pre-grouped as [blocks, 10, 4*tb] flattened back to [10, 4T]
    grid = (n_tiles, n_blocks)

    kernel = functools.partial(_bf_kernel, tb=tb, rt=rt)
    bt, btri = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 16), lambda i, j: (i, 0)),
            pl.BlockSpec((16, 4 * tb), lambda i, j: (0, j)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rt, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    ), r, w, t0.reshape(n, 1))
    return bt.reshape(n), btri.reshape(n)


def intersect_brute_mxu(origin, direction, v0, v1, v2, t_max=None,
                        ray_tile: int = 1024, tri_block: int = 512,
                        interpret: bool = False) -> TriHit:
    """Fused Pallas MXU brute-force intersector (module docstring).

    Pads rays to ``ray_tile`` and triangles to ``tri_block``; pad rays
    are aimed nowhere (direction 0 -> every a = 0 -> all culled).
    ``ray_tile`` must be a multiple of 8 (state blocks are (rt, 1)
    columns and Mosaic needs the sublane dim % 8 == 0).
    """
    assert ray_tile % 8 == 0, "ray_tile must be a multiple of 8"
    n = origin.shape[0]
    npad = (-n) % ray_tile
    v0 = jnp.asarray(v0, jnp.float32)
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    center = _scene_center(v0, v1, v2)
    origin = jnp.asarray(origin, jnp.float32) - center
    v0, v1, v2 = v0 - center, v1 - center, v2 - center
    direction = jnp.asarray(direction, jnp.float32)
    if npad:
        origin = jnp.concatenate([origin, jnp.zeros((npad, 3), jnp.float32)])
        direction = jnp.concatenate([direction, jnp.zeros((npad, 3), jnp.float32)])
    t_count = v0.shape[0]
    tpad = (-t_count) % tri_block
    if tpad:
        z = jnp.zeros((tpad, 3), jnp.float32)
        v0 = jnp.concatenate([v0, z])
        v1 = jnp.concatenate([v1, z])
        v2 = jnp.concatenate([v2, z])

    r = ray_features(origin, direction)  # [N', 10]
    # Pad the feature axis to 16 (sublane-friendly; zeros are inert).
    r = jnp.concatenate([r, jnp.zeros((r.shape[0], 6), jnp.float32)], axis=1)
    w = tri_weights(v0, v1, v2)  # [10, 4T']
    tp = v0.shape[0]
    # Regroup so each grid step j sees [16, 4*tb] = that block's
    # [a | t | u | v] columns, zero-padded features 10->16.
    w = (
        w.reshape(10, 4, tp // tri_block, tri_block)
        .transpose(0, 2, 1, 3)
        .reshape(10, tp // tri_block, 4 * tri_block)
        .transpose(1, 0, 2)  # [blocks, 10, 4*tb]
    )
    w = jnp.concatenate(
        [w, jnp.zeros((w.shape[0], 6, w.shape[2]), jnp.float32)], axis=1
    )
    w = w.transpose(1, 0, 2).reshape(16, -1)  # [16, blocks*4*tb]

    t0_full = jnp.full((origin.shape[0],), BIG, jnp.float32)
    if t_max is not None:
        t0_full = t0_full.at[:n].set(t_max)

    bt, btri = _bf_pallas(r, w, t0_full, ray_tile, tri_block, interpret)
    bt, btri = bt[:n], btri[:n]
    # Pad-slot wins are impossible (a = 0), but a lane that never beat
    # t_max reports a miss.
    bt = jnp.where(btri >= 0, bt, BIG)
    # Map padded tri ids (always < t_count because pads are culled).
    zero = jnp.zeros((n,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))


def intersect_mesh_mxu(origin, direction, mesh, t_max=None) -> TriHit:
    """Brute-force dispatch: fused Pallas kernel on TPU, jnp/einsum
    reference elsewhere (identical results). The winner's u/v/t are
    re-derived by mesh.refine_tri_hit, as with the KD traversals."""
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    if jax.default_backend() == "tpu":
        return intersect_brute_mxu(
            origin, direction, mesh.v0, mesh.v1, mesh.v2, t_max=t_max
        )
    return intersect_brute_mxu_ref(
        origin, direction, mesh.v0, mesh.v1, mesh.v2, t_max=t_max
    )

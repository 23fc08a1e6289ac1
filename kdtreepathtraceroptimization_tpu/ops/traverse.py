"""Vectorized KD-tree traversal on device.

TPU-native re-design of the reference's CUDA traversals
(src/pathtrace.cu:881-1235 traverseKDbare / traverseKDbareShortHybrid,
:1238-1566 traverseKDshort). The CUDA versions are per-thread scalar
walks with a 4000-entry visited array or a register stack. On a vector
machine the equivalent is a ``lax.while_loop`` stepping ALL rays in
lockstep, with per-lane integer state and node fields gathered from HBM:

1. ``traverse_skiplink`` — completely stackless. Nodes are laid out in
   DFS pre-order with a precomputed *skip link* (accel/kdtree.py), so
   each step is: gather node -> AABB test -> advance to either
   ``id+1`` (descend) or ``skip`` (prune/next subtree). One gather per
   step, no per-lane stack memory, uniform control flow — the TPU analog
   of the reference's visited-flag stackless walk (pathtrace.cu:881-1020)
   but O(1) state instead of O(nodes) flags.

2. ``traverse_shortstack`` — the headline short-stack algorithm
   (pathtrace.cu:1023-1235): children are visited near-first by ray
   direction sign on the split axis, the far child is pushed to a
   per-lane [K] stack in registers/VMEM, and ``dist > t_best`` prunes
   whole subtrees. Fewer steps per ray at the cost of a [N, K] stack.

Leaves are processed in fixed-size triangle chunks with a per-lane
cursor so any leaf size works with static shapes.

Both return only the winning triangle index; the differentiable hit
refinement happens outside the loop (ops/mesh.py), so gradients flow
to vertices/rays without differentiating through the while_loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import intersect as isect
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm


class _DeviceNodes(NamedTuple):
    axis: jax.Array
    split_pos: jax.Array
    bbox_min: jax.Array
    bbox_max: jax.Array
    left: jax.Array
    right: jax.Array
    skip: jax.Array
    tri_start: jax.Array
    tri_count: jax.Array


def _device_nodes(kd) -> _DeviceNodes:
    n = kd.nodes
    return _DeviceNodes(
        axis=jnp.asarray(n.axis),
        split_pos=jnp.asarray(n.split_pos),
        bbox_min=jnp.asarray(n.bbox_min),
        bbox_max=jnp.asarray(n.bbox_max),
        left=jnp.asarray(n.left),
        right=jnp.asarray(n.right),
        skip=jnp.asarray(n.skip),
        tri_start=jnp.asarray(n.tri_start),
        tri_count=jnp.asarray(n.tri_count),
    )


def _leaf_chunk_intersect(origin, direction, kd_tris, start, count, cursor, chunk,
                          best_t, best_tri, best_u, best_v, active):
    """Intersect one [chunk]-sized slice of each active lane's leaf.

    Gathers ``chunk`` triangle records per lane (indices start+cursor..),
    masks lanes/slots past the leaf end, and min-reduces into the running
    best hit. Mirrors the per-leaf loop at pathtrace.cu:1113-1165.
    """
    n = origin.shape[0]
    offs = jnp.arange(chunk, dtype=jnp.int32)[None, :]  # [1, C]
    idx = start[:, None] + cursor[:, None] + offs  # [N, C]
    valid = active[:, None] & (cursor[:, None] + offs < count[:, None])
    idx_c = jnp.clip(idx, 0, kd_tris.v0.shape[0] - 1)

    tv0 = jnp.asarray(kd_tris.v0)[idx_c]  # [N, C, 3]
    tv1 = jnp.asarray(kd_tris.v1)[idx_c]
    tv2 = jnp.asarray(kd_tris.v2)[idx_c]

    # Möller–Trumbore per (lane, slot) — same math as the [N, T]
    # broadcast version but with per-lane gathered triangles.
    e1 = tv1 - tv0
    e2 = tv2 - tv0
    d = direction[:, None, :]
    p = jnp.cross(d, e2)
    a = jnp.sum(e1 * p, axis=-1)
    det_ok = a > 1.19e-7  # back-face culled, as glm (intersect.inl)
    f = 1.0 / jnp.where(det_ok, a, 1.0)
    s = origin[:, None, :] - tv0
    u = f * jnp.sum(s * p, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    ok = valid & det_ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    t = jnp.where(ok, t, BIG)

    slot = jnp.argmin(t, axis=1)
    rows = jnp.arange(n)
    ct, cu, cv = t[rows, slot], u[rows, slot], v[rows, slot]
    cidx = idx[rows, slot]
    better = ct < best_t
    return (
        jnp.where(better, ct, best_t),
        jnp.where(better, cidx, best_tri),
        jnp.where(better, cu, best_u),
        jnp.where(better, cv, best_v),
    )


def traverse_skiplink(origin, direction, kd, config: RenderConfig,
                      t_init=None) -> TriHit:
    """Stackless skip-link traversal (see module docstring)."""
    nodes = _device_nodes(kd)
    m = nodes.axis.shape[0]
    n = origin.shape[0]
    chunk = config.leaf_chunk

    def cond(state):
        cur, cursor, bt, btri, bu, bv, steps = state
        return jnp.logical_and(
            jnp.any(cur < m), steps < config.max_traversal_steps
        )

    def body(state):
        cur, cursor, bt, btri, bu, bv, steps = state
        active = cur < m
        cur_c = jnp.clip(cur, 0, m - 1)

        ax = nodes.axis[cur_c]
        bmin = nodes.bbox_min[cur_c]
        bmax = nodes.bbox_max[cur_c]
        skip = nodes.skip[cur_c]
        tstart = nodes.tri_start[cur_c]
        tcount = nodes.tri_count[cur_c]

        entering = cursor == 0
        hit_box, dist = isect.intersect_aabb(origin, direction, bmin, bmax)
        # Prune on miss or provably-farther subtree (pathtrace.cu:1095).
        pruned = entering & (~hit_box | (dist > bt))

        is_leaf = ax < 0
        do_leaf = active & is_leaf & ~pruned

        bt, btri, bu, bv = _leaf_chunk_intersect(
            origin, direction, kd.tris, tstart, tcount, cursor, chunk,
            bt, btri, bu, bv, do_leaf,
        )

        new_cursor_leaf = cursor + chunk
        leaf_done = new_cursor_leaf >= tcount

        nxt = jnp.where(
            pruned,
            skip,
            jnp.where(
                is_leaf,
                jnp.where(leaf_done, skip, cur),
                cur + 1,  # descend: first child is pre-order successor
            ),
        )
        new_cursor = jnp.where(is_leaf & ~pruned & ~leaf_done, new_cursor_leaf, 0)

        cur = jnp.where(active, nxt, cur)
        cursor = jnp.where(active, new_cursor, cursor)
        return (cur, cursor, bt, btri, bu, bv, steps + 1)

    t0 = jnp.full((n,), BIG, jnp.float32) if t_init is None else t_init
    state = (
        jnp.zeros((n,), jnp.int32),  # start at root (id 0)
        jnp.zeros((n,), jnp.int32),
        t0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.int32(0),
    )
    _, _, bt, btri, bu, bv, _ = jax.lax.while_loop(cond, body, state)
    # Discrete selection; gradients come from mesh.refine_tri_hit.
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=bu, v=bv))


def traverse_shortstack(origin, direction, kd, config: RenderConfig,
                        t_init=None) -> TriHit:
    """Near/far-ordered short-stack traversal (headline algorithm analog,
    pathtrace.cu:1023-1235)."""
    nodes = _device_nodes(kd)
    m = nodes.axis.shape[0]
    n = origin.shape[0]
    chunk = config.leaf_chunk
    # The stack need never exceed the tree depth (+slack): only far
    # children are pushed, at most one per level. kd.max_depth is a static
    # Python int, so the stack is exactly as small as the tree allows
    # (vs. the reference's fixed 4000-entry arrays, pathtrace.cu:100).
    k = max(2, kd.max_depth + 2)

    NO_NODE = jnp.int32(-1)

    def cond(state):
        cur, sp, stack, cursor, bt, btri, bu, bv, steps = state
        return jnp.logical_and(
            jnp.any((cur >= 0) | (sp > 0)), steps < config.max_traversal_steps
        )

    def body(state):
        cur, sp, stack, cursor, bt, btri, bu, bv, steps = state

        # Lanes with no current node pop from their stack.
        need_pop = (cur < 0) & (sp > 0)
        sp_idx = jnp.clip(sp - 1, 0, k - 1)
        popped = stack[jnp.arange(n), sp_idx]
        cur = jnp.where(need_pop, popped, cur)
        sp = jnp.where(need_pop, sp - 1, sp)

        active = cur >= 0
        cur_c = jnp.clip(cur, 0, m - 1)

        ax = nodes.axis[cur_c]
        bmin = nodes.bbox_min[cur_c]
        bmax = nodes.bbox_max[cur_c]
        left = nodes.left[cur_c]
        right = nodes.right[cur_c]
        tstart = nodes.tri_start[cur_c]
        tcount = nodes.tri_count[cur_c]

        entering = cursor == 0
        hit_box, dist = isect.intersect_aabb(origin, direction, bmin, bmax)
        pruned = entering & (~hit_box | (dist > bt))

        is_leaf = ax < 0
        do_leaf = active & is_leaf & ~pruned
        bt, btri, bu, bv = _leaf_chunk_intersect(
            origin, direction, kd.tris, tstart, tcount, cursor, chunk,
            bt, btri, bu, bv, do_leaf,
        )
        new_cursor_leaf = cursor + chunk
        leaf_done = new_cursor_leaf >= tcount

        # Near/far ordering by ray direction sign on the split axis
        # (pathtrace.cu:1104-1112): positive direction -> left (low) side
        # first.
        dir_ax = jnp.take_along_axis(direction, jnp.clip(ax, 0, 2)[:, None], axis=1)[:, 0]
        near = jnp.where(dir_ax >= 0, left, right)
        far = jnp.where(dir_ax >= 0, right, left)
        # Missing children: descend into whichever exists.
        descend_to = jnp.where(near >= 0, near, far)
        push_far = active & ~is_leaf & ~pruned & (near >= 0) & (far >= 0)

        # Push far child.
        sp_push = jnp.clip(sp, 0, k - 1)
        stack = stack.at[jnp.arange(n), sp_push].set(
            jnp.where(push_far, far, stack[jnp.arange(n), sp_push])
        )
        sp = jnp.where(push_far & (sp < k), sp + 1, sp)

        nxt = jnp.where(
            pruned,
            NO_NODE,
            jnp.where(
                is_leaf,
                jnp.where(leaf_done, NO_NODE, cur),
                descend_to,
            ),
        )
        new_cursor = jnp.where(is_leaf & ~pruned & ~leaf_done, new_cursor_leaf, 0)

        cur = jnp.where(active, nxt, cur)
        cursor = jnp.where(active, new_cursor, cursor)
        return (cur, sp, stack, cursor, bt, btri, bu, bv, steps + 1)

    t0 = jnp.full((n,), BIG, jnp.float32) if t_init is None else t_init
    state = (
        jnp.zeros((n,), jnp.int32),  # cur = root
        jnp.zeros((n,), jnp.int32),  # sp
        jnp.full((n, k), -1, jnp.int32),
        jnp.zeros((n,), jnp.int32),  # cursor
        t0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.int32(0),
    )
    _, _, _, _, bt, btri, bu, bv, _ = jax.lax.while_loop(cond, body, state)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=bu, v=bv))


def traverse_pushdown(origin, direction, kd, config: RenderConfig,
                      t_init=None) -> TriHit:
    """Horn-style push-down-restart short-stack traversal — the last of
    the reference's traversal variants (traverseKDshort,
    pathtrace.cu:1238-1414).

    Per-ray state is a parametric interval [tmin, tmax]: internal nodes
    classify the split by tSplit = (splitPos - o[ax]) / d[ax] against
    the interval (near-only / far-only / both), BOTH pushes the far
    interval on a genuinely SHORT fixed stack — an overflowing push
    evicts the OLDEST (bottom) entry, which always holds the FARTHEST
    pending interval, so every evicted interval lies beyond all
    retained ones and a RESTART (empty stack) re-enters at
    [tmax, sceneMax] and re-walks their union. The restart does not start at the
    global root: while the ray has taken only single-child descents the
    root is PUSHED DOWN to the deepest node containing the whole
    remaining interval (pathtrace.cu:1293-1299, 1388-1389). Exact
    (brute-equal): a lane retires when a found hit lies inside its
    processed interval (t-ordered intervals cannot be beaten later) or
    the interval reaches sceneMax.
    """
    nodes = _device_nodes(kd)
    m = nodes.axis.shape[0]
    n = origin.shape[0]
    chunk = config.leaf_chunk
    k = max(2, int(config.pushdown_stack))
    NO_NODE = jnp.int32(-1)
    lanes = jnp.arange(n)

    def cond(state):
        (cur, rootn, tmin, tmax, pushd, sp, st_n, st_lo, st_hi, cursor,
         bt, btri, bu, bv, done, steps) = state
        return jnp.logical_and(jnp.any(~done),
                               steps < config.max_traversal_steps)

    def body(state):
        (cur, rootn, tmin, tmax, pushd, sp, st_n, st_lo, st_hi, cursor,
         bt, btri, bu, bv, done, steps) = state

        # -- pop / restart / retire for lanes with no current node ----
        need = (cur < 0) & ~done
        can_pop = need & (sp > 0)
        spi = jnp.clip(sp - 1, 0, k - 1)
        cur = jnp.where(can_pop, st_n[lanes, spi], cur)
        tmin = jnp.where(can_pop, st_lo[lanes, spi], tmin)
        tmax = jnp.where(can_pop, st_hi[lanes, spi], tmax)
        sp = jnp.where(can_pop, sp - 1, sp)
        pushd = jnp.where(can_pop, False, pushd)
        restart = need & ~can_pop & (tmax < BIG)
        cur = jnp.where(restart, rootn, cur)
        tmin = jnp.where(restart, tmax, tmin)
        tmax = jnp.where(restart, BIG, tmax)
        pushd = jnp.where(restart, True, pushd)
        done = done | (need & ~can_pop & ~restart)

        active = (cur >= 0) & ~done
        cur_c = jnp.clip(cur, 0, m - 1)
        ax = nodes.axis[cur_c]
        split = nodes.split_pos[cur_c]
        left = nodes.left[cur_c]
        right = nodes.right[cur_c]
        tstart = nodes.tri_start[cur_c]
        tcount = nodes.tri_count[cur_c]
        is_leaf = ax < 0

        # -- internal: classify the split against [tmin, tmax] --------
        axc = jnp.clip(ax, 0, 2)[:, None]
        o_ax = jnp.take_along_axis(origin, axc, axis=1)[:, 0]
        d_ax = jnp.take_along_axis(direction, axc, axis=1)[:, 0]
        d_safe = jnp.where(jnp.abs(d_ax) < 1e-30,
                           jnp.where(d_ax < 0, -1e-30, 1e-30), d_ax)
        t_split = (split - o_ax) / d_safe
        # near = the ORIGIN's side (not the direction sign: a ray that
        # starts past the split has t_split < 0 and must visit the
        # high side, which direction-based naming would call "far")
        near = jnp.where(o_ax < split, left, right)
        far = jnp.where(o_ax < split, right, left)
        # missing-child degenerate nodes descend into whichever exists
        near_eff = jnp.where(near >= 0, near, far)
        far_eff = jnp.where(far >= 0, far, near)
        near_only = (t_split >= tmax) | (t_split < 0.0)
        far_only = ~near_only & (t_split <= tmin)
        both = ~near_only & ~far_only & (near >= 0) & (far >= 0)

        # Pushes stack in NEAR-to-far order from the bottom up: each new
        # far interval [t_split, tmax] lies BELOW every retained entry
        # (tmax shrank to the previous t_split).  On overflow Horn's
        # scheme must therefore discard the OLDEST (bottom) entry — the
        # farthest pending interval — so every dropped interval lies
        # beyond all retained ones and the empty-stack restart
        # [tmax, BIG] re-walks their union.  (Dropping the NEWEST would
        # leave a never-revisited gap below the retained top and break
        # the bt <= tmax early-retire contiguity invariant.)
        want_push = active & ~is_leaf & both
        push = want_push & (sp < k)
        ovf = want_push & (sp >= k)
        st_n = jnp.where(ovf[:, None], jnp.roll(st_n, -1, axis=1), st_n)
        st_lo = jnp.where(ovf[:, None], jnp.roll(st_lo, -1, axis=1), st_lo)
        st_hi = jnp.where(ovf[:, None], jnp.roll(st_hi, -1, axis=1), st_hi)
        wr = push | ovf
        spp = jnp.where(ovf, k - 1, jnp.clip(sp, 0, k - 1))
        st_n = st_n.at[lanes, spp].set(
            jnp.where(wr, far, st_n[lanes, spp]))
        st_lo = st_lo.at[lanes, spp].set(
            jnp.where(wr, t_split, st_lo[lanes, spp]))
        st_hi = st_hi.at[lanes, spp].set(
            jnp.where(wr, tmax, st_hi[lanes, spp]))
        sp = jnp.where(push, sp + 1, sp)

        desc = jnp.where(both, near_eff,
                         jnp.where(far_only, far_eff, near_eff))
        went_int = active & ~is_leaf
        tmax = jnp.where(went_int & both, t_split, tmax)
        # push-down: single-child descents keep the restart point moving
        rootn = jnp.where(went_int & pushd & ~both, desc, rootn)
        pushd = jnp.where(went_int & both, False, pushd)

        # -- leaf: chunked triangle tests -----------------------------
        do_leaf = active & is_leaf
        bt, btri, bu, bv = _leaf_chunk_intersect(
            origin, direction, kd.tris, tstart, tcount, cursor, chunk,
            bt, btri, bu, bv, do_leaf,
        )
        new_cursor_leaf = cursor + chunk
        leaf_done = new_cursor_leaf >= tcount
        # early retire: a hit inside the processed interval is final
        done = done | (do_leaf & leaf_done & (bt <= tmax))

        nxt = jnp.where(is_leaf,
                        jnp.where(leaf_done, NO_NODE, cur), desc)
        new_cursor = jnp.where(is_leaf & ~leaf_done, new_cursor_leaf, 0)
        cur = jnp.where(active, nxt, cur)
        cursor = jnp.where(active, new_cursor, cursor)
        return (cur, rootn, tmin, tmax, pushd, sp, st_n, st_lo, st_hi,
                cursor, bt, btri, bu, bv, done, steps + 1)

    t0 = jnp.full((n,), BIG, jnp.float32) if t_init is None else t_init
    state = (
        jnp.zeros((n,), jnp.int32),               # cur = root
        jnp.zeros((n,), jnp.int32),               # pushed-down root
        jnp.zeros((n,), jnp.float32),             # tmin
        jnp.full((n,), BIG, jnp.float32),         # tmax
        jnp.ones((n,), bool),                     # pushdown
        jnp.zeros((n,), jnp.int32),               # sp
        jnp.full((n, k), -1, jnp.int32),
        jnp.zeros((n, k), jnp.float32),
        jnp.zeros((n, k), jnp.float32),
        jnp.zeros((n,), jnp.int32),               # leaf cursor
        t0,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), bool),                    # done
        jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, state)
    bt, btri, bu, bv = out[10], out[11], out[12], out[13]
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=bu, v=bv))


# ---------------------------------------------------------------------------
# Fat-row traversal — the TPU-tuned production path
# ---------------------------------------------------------------------------
#
# Measured on TPU v5e: a row gather inside an XLA loop costs a flat
# ~2.5 ns/lane regardless of row width, and every *additional* gather op
# in the loop body multiplies that cost. The thin-SoA traversals above
# issue ~10 gathers per step (8 node fields + 3 triangle arrays); the
# fat-row variants below issue exactly ONE [n, 12+9*cap] row gather per
# step (accel/kdtree.py FatRows): node header and up to ``cap`` leaf
# triangles arrive together, and oversized leaves chain through
# continuation rows instead of a per-lane cursor. Combined with
# ``t_init`` pruning (nearest analytic hit bounds the walk) and
# ``active`` masking (terminated wavefront lanes start in the done
# state), this is ~10-50x faster than the thin traversals on real
# hardware while visiting exactly the same nodes.


def _mt_inline(origin, direction, tri_block, inline_n, tri_base, do_leaf,
               best_t, best_tri):
    """Möller–Trumbore over the ``cap`` inline triangle slots of each
    lane's current fat row.

    tri_block: [N, 9*cap], COMPONENT-MAJOR (accel/kdtree._tri_chunk_rows):
    group g is a contiguous [N, cap] slice holding component g of every
    slot. Everything here is elementwise math on [N, cap] slices plus
    min/argmin reductions — no reshapes, no transposes, no fancy-index
    gathers (the [n, cap, 3] layout + per-lane ``t[rows, slot]`` pulls
    cost ~10x the whole rest of the loop body on TPU). The winner's
    u/v/t are re-derived differentiably outside the loop
    (ops/mesh.refine_tri_hit), so only (t, tri) are tracked."""
    cap = tri_block.shape[1] // 9

    def comp(g):  # [N, cap] contiguous slice: component g of all slots
        return tri_block[:, g * cap:(g + 1) * cap]

    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    v0x, v0y, v0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3) - v0x, comp(4) - v0y, comp(5) - v0z
    e2x, e2y, e2z = comp(6) - v0x, comp(7) - v0y, comp(8) - v0z

    # p = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    a = e1x * px + e1y * py + e1z * pz
    det_ok = a > 1.19e-7  # back-face culled, as glm (intersect.inl)
    f = 1.0 / jnp.where(det_ok, a, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * px + sy * py + sz * pz)
    # q = s x e1
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)

    offs = jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = do_leaf[:, None] & (offs < inline_n[:, None])
    ok = valid & det_ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    t = jnp.where(ok, t, BIG)

    ct = jnp.min(t, axis=1)
    slot = jnp.argmin(t, axis=1).astype(jnp.int32)
    better = ct < best_t
    return (
        jnp.where(better, ct, best_t),
        jnp.where(better, tri_base + slot, best_tri),
    )


def _fatrow_skiplink_tile(origin, direction, rows_dev, n_rows, cap,
                          config: RenderConfig, t0, active, start=None):
    """Stackless skip-link walk over the fat-row table for one ray tile.

    ``start``: per-lane entry row (used by the octant layouts, where a
    ray enters at ``octant * layout_size``); default row 0.
    """
    n = origin.shape[0]

    unroll = max(1, config.traversal_unroll)

    def cond(state):
        cur, bt, btri, steps = state
        return jnp.logical_and(
            jnp.any(cur < n_rows), steps < config.max_traversal_steps
        )

    def one_step(cur, bt, btri):
        lane_on = cur < n_rows
        cur_c = jnp.clip(cur, 0, n_rows - 1)

        row = rows_dev[cur_c]  # [n, 12+9*cap] — THE one gather
        axis = row[:, 0]
        bmin, bmax = row[:, 1:4], row[:, 4:7]
        skip = row[:, 7].astype(jnp.int32)
        nxt_link = row[:, 8].astype(jnp.int32)  # left child / continuation
        tri_base = row[:, 10].astype(jnp.int32)
        inline_n = row[:, 11].astype(jnp.int32)

        hit_box, dist = isect.intersect_aabb(origin, direction, bmin, bmax)
        pruned = ~hit_box | (dist > bt)
        is_leaf = axis < 0
        do_leaf = lane_on & is_leaf & ~pruned

        bt, btri = _mt_inline(
            origin, direction, row[:, 12:], inline_n, tri_base, do_leaf,
            bt, btri,
        )

        # leaf: continuation chain else skip out; internal: descend left.
        leaf_next = jnp.where(nxt_link >= 0, nxt_link, skip)
        nxt = jnp.where(pruned, skip, jnp.where(is_leaf, leaf_next, nxt_link))
        return jnp.where(lane_on, nxt, cur), bt, btri

    def body(state):
        cur, bt, btri, steps = state
        # Several steps per while iteration: the loop's fixed
        # per-iteration cost (cond eval + state sequencing) is paid
        # once per `unroll` gathers; finished lanes idle harmlessly.
        for _ in range(unroll):
            cur, bt, btri = one_step(cur, bt, btri)
        return (cur, bt, btri, steps + unroll)

    entry = jnp.zeros((n,), jnp.int32) if start is None else start
    state = (
        jnp.where(active, entry, n_rows).astype(jnp.int32),
        t0,
        jnp.full((n,), -1, jnp.int32),
        jnp.int32(0),
    )
    _, bt, btri, _ = jax.lax.while_loop(cond, body, state)
    return bt, btri


def _fatrow_shortstack_tile(origin, direction, rows_dev, n_rows, cap,
                            config: RenderConfig, t0, active, k):
    """Near/far-ordered short-stack walk over the fat-row table
    (headline algorithm analog, pathtrace.cu:1023-1235)."""
    n = origin.shape[0]
    NO = jnp.int32(-1)
    lanes = jnp.arange(n)

    def cond(state):
        cur, sp, stack, bt, btri, steps = state
        return jnp.logical_and(
            jnp.any((cur >= 0) | (sp > 0)), steps < config.max_traversal_steps
        )

    def body(state):
        cur, sp, stack, bt, btri, steps = state
        need_pop = (cur < 0) & (sp > 0)
        sp_idx = jnp.clip(sp - 1, 0, k - 1)
        cur = jnp.where(need_pop, stack[lanes, sp_idx], cur)
        sp = jnp.where(need_pop, sp - 1, sp)
        lane_on = cur >= 0
        cur_c = jnp.clip(cur, 0, n_rows - 1)

        row = rows_dev[cur_c]
        axis = row[:, 0]
        bmin, bmax = row[:, 1:4], row[:, 4:7]
        left = row[:, 8].astype(jnp.int32)
        right = row[:, 9].astype(jnp.int32)
        tri_base = row[:, 10].astype(jnp.int32)
        inline_n = row[:, 11].astype(jnp.int32)

        hit_box, dist = isect.intersect_aabb(origin, direction, bmin, bmax)
        pruned = ~hit_box | (dist > bt)
        is_leaf = axis < 0
        do_leaf = lane_on & is_leaf & ~pruned

        bt, btri = _mt_inline(
            origin, direction, row[:, 12:], inline_n, tri_base, do_leaf,
            bt, btri,
        )

        # Near child first by ray direction sign on the split axis
        # (pathtrace.cu:1104-1112); far child pushed for later.
        dir_ax = jnp.take_along_axis(
            direction, jnp.clip(axis.astype(jnp.int32), 0, 2)[:, None], axis=1
        )[:, 0]
        near = jnp.where(dir_ax >= 0, left, right)
        far = jnp.where(dir_ax >= 0, right, left)
        descend_to = jnp.where(near >= 0, near, far)
        push_far = lane_on & ~is_leaf & ~pruned & (near >= 0) & (far >= 0)

        sp_push = jnp.clip(sp, 0, k - 1)
        stack = stack.at[lanes, sp_push].set(
            jnp.where(push_far, far, stack[lanes, sp_push])
        )
        sp = jnp.where(push_far & (sp < k), sp + 1, sp)

        leaf_next = left  # continuation chain; -1 ends the chain -> pop
        nxt = jnp.where(
            pruned, NO, jnp.where(is_leaf, leaf_next, descend_to)
        )
        cur = jnp.where(lane_on, nxt, cur)
        return (cur, sp, stack, bt, btri, steps + 1)

    state = (
        jnp.where(active, 0, -1).astype(jnp.int32),
        jnp.zeros((n,), jnp.int32),
        jnp.full((n, k), -1, jnp.int32),
        t0,
        jnp.full((n,), -1, jnp.int32),
        jnp.int32(0),
    )
    _, _, _, bt, btri, _ = jax.lax.while_loop(cond, body, state)
    return bt, btri


def _mt_inline_packet(o, d, tri_block, inline_n, tri_base, do_leaf, lane_ok,
                      best_t, best_tri):
    """Möller–Trumbore over the inline slots of each PACKET's current fat
    row: every lane of a packet tests the same ``cap`` triangles.

    o, d: [npk, P, 3]; tri_block: [npk, 9*cap] component-major;
    inline_n/tri_base/do_leaf: [npk]; lane_ok/best_t/best_tri: [npk, P].
    All math is dense [npk, P, cap] VPU work — the packet design trades
    the per-lane row gather (the measured 7 ns/lane/step latency wall,
    exp/gather_micro.py) for broadcast flops, which the VPU delivers
    ~3 orders of magnitude cheaper.
    """
    cap = tri_block.shape[1] // 9

    def comp(g):  # [npk, 1, cap]: component g of all slots, broadcast-ready
        return tri_block[:, None, g * cap:(g + 1) * cap]

    ox, oy, oz = o[:, :, 0:1], o[:, :, 1:2], o[:, :, 2:3]  # [npk, P, 1]
    dx, dy, dz = d[:, :, 0:1], d[:, :, 1:2], d[:, :, 2:3]
    v0x, v0y, v0z = comp(0), comp(1), comp(2)
    e1x, e1y, e1z = comp(3) - v0x, comp(4) - v0y, comp(5) - v0z
    e2x, e2y, e2z = comp(6) - v0x, comp(7) - v0y, comp(8) - v0z

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    a = e1x * px + e1y * py + e1z * pz
    det_ok = a > 1.19e-7  # back-face culled, as glm (intersect.inl)
    f = 1.0 / jnp.where(det_ok, a, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * px + sy * py + sz * pz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)

    cap_r = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
    valid = (do_leaf[:, None, None] & lane_ok[:, :, None]
             & (cap_r < inline_n[:, None, None]))
    ok = valid & det_ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    t = jnp.where(ok, t, BIG)

    ct = jnp.min(t, axis=2)  # [npk, P]
    slot = jnp.argmin(t, axis=2).astype(jnp.int32)
    better = ct < best_t
    return (
        jnp.where(better, ct, best_t),
        jnp.where(better, tri_base[:, None] + slot, best_tri),
    )


def _fatrow_packet_tile(origin, direction, rows_dev, n_rows, cap,
                        config: RenderConfig, t0, active, k, P):
    """Packet short-stack traversal: the TPU-native headline kernel.

    Re-design of the reference's hybrid short-stack walk
    (pathtrace.cu:1023-1235) around the measured TPU cost model
    (exp/gather_micro.py): an in-loop row gather costs a flat ~7 ns/lane
    regardless of row width — pure issue latency — while dense VPU math
    costs ~0.01 ns/flop/lane. So instead of one traversal cursor per RAY
    (a [n] gather per step), rays are grouped into packets of ``P``
    consecutive coherence-sorted lanes sharing ONE cursor: the gather
    shrinks to [n/P] lanes (cost /P), and the per-lane AABB tests +
    inline Möller–Trumbore become dense [npk, P(, cap)] broadcasts.

    Correctness does not depend on coherence: a packet descends iff ANY
    live lane's slab test wants the subtree (entry dist <= that lane's
    best t), so every lane sees a superset of the nodes its own walk
    would visit; incoherent packets only cost extra steps, never wrong
    images. Near/far child ordering is dynamic per packet (majority
    direction sign on the split axis), so large meshes get the pruning
    the per-ray path only had below the octant-table cap.

    State per packet: cursor, short stack [k] (far children), t-bound =
    max over live lanes' best t. Per lane: best (t, tri).
    """
    n = origin.shape[0]
    npk = n // P
    o = origin.reshape(npk, P, 3)
    d = direction.reshape(npk, P, 3)
    bt = t0.reshape(npk, P)
    act = active.reshape(npk, P)
    NO = jnp.int32(-1)
    pk = jnp.arange(npk)

    # Packet pruning bound: lanes prune with their own bt; the PACKET
    # prunes only when no live lane wants the node. Dead lanes never
    # want (masked below), so they cannot extend a packet's walk.
    def cond(state):
        cur, sp, stack, bt, btri, steps = state
        return jnp.logical_and(
            jnp.any((cur >= 0) | (sp > 0)), steps < config.max_traversal_steps
        )

    def one_step(cur, sp, stack, bt, btri):
        need_pop = (cur < 0) & (sp > 0)
        sp_idx = jnp.clip(sp - 1, 0, k - 1)
        cur = jnp.where(need_pop, stack[pk, sp_idx], cur)
        sp = jnp.where(need_pop, sp - 1, sp)
        pk_on = cur >= 0
        cur_c = jnp.clip(cur, 0, n_rows - 1)

        row = rows_dev[cur_c]  # [npk, W] — THE one (cheap) gather
        axis = row[:, 0]
        bmin, bmax = row[:, None, 1:4], row[:, None, 4:7]  # [npk, 1, 3]
        left = row[:, 8].astype(jnp.int32)
        right = row[:, 9].astype(jnp.int32)
        tri_base = row[:, 10].astype(jnp.int32)
        inline_n = row[:, 11].astype(jnp.int32)

        hit_box, dist = isect.intersect_aabb(o, d, bmin, bmax)  # [npk, P]
        want = act & hit_box & (dist <= bt)  # per-lane interest
        enter = pk_on & jnp.any(want, axis=1)  # packet vote
        is_leaf = axis < 0
        do_leaf = enter & is_leaf

        bt, btri = _mt_inline_packet(
            o, d, row[:, 12:], inline_n, tri_base, do_leaf, act, bt, btri,
        )

        # Near/far by majority direction sign on the split axis
        # (pathtrace.cu:1104-1112, per-packet instead of per-thread).
        ax_c = jnp.clip(axis.astype(jnp.int32), 0, 2)
        d_ax = jnp.take_along_axis(d, ax_c[:, None, None], axis=2)[:, :, 0]
        vote = jnp.sum(jnp.where(act, jnp.sign(d_ax), 0.0), axis=1)
        go_left_first = vote >= 0
        near = jnp.where(go_left_first, left, right)
        far = jnp.where(go_left_first, right, left)
        descend_to = jnp.where(near >= 0, near, far)
        push_far = enter & ~is_leaf & (near >= 0) & (far >= 0)

        sp_push = jnp.clip(sp, 0, k - 1)
        stack = stack.at[pk, sp_push].set(
            jnp.where(push_far, far, stack[pk, sp_push])
        )
        sp = jnp.where(push_far & (sp < k), sp + 1, sp)

        leaf_next = left  # leaf continuation chain; -1 ends it -> pop
        nxt = jnp.where(~enter, NO, jnp.where(is_leaf, leaf_next, descend_to))
        cur = jnp.where(pk_on, nxt, cur)
        return cur, sp, stack, bt, btri

    unroll = max(1, config.traversal_unroll)

    def body(state):
        cur, sp, stack, bt, btri, steps = state
        for _ in range(unroll):
            cur, sp, stack, bt, btri = one_step(cur, sp, stack, bt, btri)
        return (cur, sp, stack, bt, btri, steps + unroll)

    pk_alive = jnp.any(act, axis=1)
    state = (
        jnp.where(pk_alive, 0, -1).astype(jnp.int32),
        jnp.zeros((npk,), jnp.int32),
        jnp.full((npk, k), -1, jnp.int32),
        bt,
        jnp.full((npk, P), -1, jnp.int32),
        jnp.int32(0),
    )
    _, _, _, bt, btri, _ = jax.lax.while_loop(cond, body, state)
    return bt.reshape(n), btri.reshape(n)


def _pick_tiles(n: int, tile_lanes: int, max_tiles: int = 0) -> int:
    """Smallest power-of-two tile count dividing n that brings each
    tile to at most ``tile_lanes`` rays (config.tile_lanes rationale);
    ``max_tiles`` > 0 caps the count. The result always divides n
    (construction only ever doubles while divisible), so a
    non-power-of-two cap is rounded DOWN to the nearest power of two
    rather than taken verbatim — min(t, cap) with e.g. cap=3 would
    break traverse_fatrow's reshape((tiles, n//tiles, ...))."""
    cap = max_tiles
    if cap:
        p = 1
        while p * 2 <= cap:
            p *= 2
        cap = p
    t = 1
    while n // t > tile_lanes and n % (t * 2) == 0:
        t *= 2
        if cap and t >= cap:
            break
    if cap:
        t = min(t, cap)
    return t


def _coherence_key(origin, direction, active, root_min, root_max):
    """Sort key clustering rays that will walk the tree similarly.

    Layout (most significant first): [inactive/miss-root] [direction
    octant] [origin morton]. Inactive lanes and lanes whose ray misses
    the root AABB sort to the back, forming tiles whose while_loop exits
    immediately; the rest tile into direction-octant + spatial clusters
    so per-tile lockstep maxima approach per-tile means. (The reference
    sorts by material for warp coherence, pathtrace.cu:2600; on TPU the
    analogous divergence is traversal length, so we sort by traversal
    locality instead.)
    """
    hit_root, _ = isect.intersect_aabb(origin, direction, root_min, root_max)
    octant = (
        (direction[:, 0] >= 0).astype(jnp.int32)
        + 2 * (direction[:, 1] >= 0).astype(jnp.int32)
        + 4 * (direction[:, 2] >= 0).astype(jnp.int32)
    )
    # 4-bit-per-axis morton of the origin inside the root box
    span = jnp.maximum(root_max - root_min, 1e-6)
    q = jnp.clip(((origin - root_min) / span) * 15.0, 0.0, 15.0).astype(jnp.int32)
    morton = jnp.zeros_like(octant)
    for b in range(4):
        for a in range(3):
            morton = morton | (((q[:, a] >> b) & 1) << (3 * b + a))
    key = (octant << 12) | morton
    return jnp.where(active & hit_root, key, jnp.int32(1 << 20))


def traverse_fatrow(origin, direction, kd, config: RenderConfig,
                    t_init=None, active=None) -> TriHit:
    """Fat-row traversal over ray tiles (see block comment above).

    ``t_init``: upper bound on useful hit distance per lane (e.g. the
    nearest analytic-geometry hit) — subtrees beyond it are pruned.
    ``active``: lanes to trace; inactive lanes cost zero steps.

    Tiling: the while_loop is lockstep, so its trip count is the max
    over all lanes in it. Scanning over smaller ray tiles makes the
    total cost sum(per-tile max) instead of n_tiles*(global max) —
    coherent tiles (primary rays, miss-heavy regions) exit early.
    """
    fat = kd.fat
    P = int(config.packet_size)
    use_packets = P > 1
    # Octant layouts give the stackless walk near-first child ordering
    # (strong t-pruning) at zero stack cost; the per-lane entry row is
    # octant * layout_size (accel/kdtree.py OctantRows). The packet walk
    # orders children dynamically instead, so it always uses the single
    # fat-row table (1/8th the memory, no table-size cap).
    use_oct = (
        config.octant_rows
        and not config.short_stack
        and not use_packets
        and getattr(kd, "oct", None) is not None
        and kd.oct.layout_size > 0
    )
    if use_oct:
        rows_dev = jnp.asarray(kd.oct.rows)
        n_rows = kd.oct.rows.shape[0]
        cap = kd.oct.inline_cap
        layout_size = kd.oct.layout_size
    else:
        rows_dev = jnp.asarray(fat.rows)
        n_rows = fat.count
        cap = fat.inline_cap
    n = origin.shape[0]

    t0 = jnp.full((n,), BIG, jnp.float32) if t_init is None else t_init
    act = jnp.ones((n,), bool) if active is None else active

    n_orig = n
    if use_packets and n % P != 0:
        # Pad to a whole number of packets with dead lanes (they never
        # vote, so they cost nothing but the pad slots themselves).
        pad = P - n % P
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), origin.dtype)])
        direction = jnp.concatenate(
            [direction, jnp.ones((pad, 3), direction.dtype)]
        )
        t0 = jnp.concatenate([t0, jnp.full((pad,), BIG, t0.dtype)])
        act = jnp.concatenate([act, jnp.zeros((pad,), bool)])
        n = n + pad

    if use_packets:
        # Packets already shrink the gather to [n/P] lanes; tiling on
        # top mostly adds sequential lax.map dispatches and per-step
        # fixed overhead on tiny packet counts. One tile per
        # ~packet_tile_lanes keeps some early-exit benefit.
        if config.packet_tile_lanes <= 0:
            tiles = 1
        else:
            tiles = _pick_tiles(n, config.packet_tile_lanes, config.traversal_tiles)
        while tiles > 1 and (n // tiles) % P != 0:
            tiles //= 2
    else:
        tiles = _pick_tiles(n, config.tile_lanes, config.traversal_tiles)
    k = max(2, kd.max_depth + 2)

    # Packets NEED the coherence sort (a packet's cost is the union of
    # its lanes' walks) even when there is only one tile.
    sorted_rays = config.sort_rays and (tiles > 1 or use_packets)
    if sorted_rays:
        key = _coherence_key(
            origin, direction, act,
            jnp.asarray(kd.root_bbox_min), jnp.asarray(kd.root_bbox_max),
        )
        # One lax.sort carrying every per-ray field as an operand is
        # ~100x cheaper on TPU than argsort + gathers (measured: 2.6ms
        # vs 40ms+ at 160k lanes).
        lane = jnp.arange(n, dtype=jnp.int32)
        (_, lane, t0, act_i,
         o0, o1, o2, d0, d1, d2) = jax.lax.sort(
            (key, lane, t0, act.astype(jnp.int32),
             origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2]),
            num_keys=1,
        )
        origin = jnp.stack([o0, o1, o2], axis=1)
        direction = jnp.stack([d0, d1, d2], axis=1)
        act = act_i.astype(bool)

    def run_tile(args):
        o, d, t0_, act_ = args
        if use_packets:
            return _fatrow_packet_tile(
                o, d, rows_dev, n_rows, cap, config, t0_, act_, k, P
            )
        if config.short_stack:
            return _fatrow_shortstack_tile(
                o, d, rows_dev, n_rows, cap, config, t0_, act_, k
            )
        start = None
        if use_oct:
            # Same bit convention as the builder: bit a set iff the
            # direction is non-negative on axis a (low child first).
            octant = (
                (d[:, 0] >= 0).astype(jnp.int32)
                + 2 * (d[:, 1] >= 0).astype(jnp.int32)
                + 4 * (d[:, 2] >= 0).astype(jnp.int32)
            )
            start = octant * layout_size
        return _fatrow_skiplink_tile(
            o, d, rows_dev, n_rows, cap, config, t0_, act_, start=start
        )

    if tiles > 1:
        shp = (tiles, n // tiles)
        bt, btri = jax.lax.map(
            run_tile,
            (
                origin.reshape(shp + (3,)),
                direction.reshape(shp + (3,)),
                t0.reshape(shp),
                act.reshape(shp),
            ),
        )
        bt, btri = bt.reshape(n), btri.reshape(n)
    else:
        bt, btri = run_tile((origin, direction, t0, act))

    if sorted_rays:
        # un-permute by re-sorting on the original lane index
        _, bt, btri = jax.lax.sort((lane, bt, btri), num_keys=1)

    if n_orig != n:
        bt, btri = bt[:n_orig], btri[:n_orig]

    # A lane that never beat t_init reports a miss; the caller merges
    # with the analytic hit it supplied as the bound. u/v are re-derived
    # from the winning triangle by mesh.refine_tri_hit (they are unused
    # by tri_hit_to_hit's loop values).
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n_orig,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))


def intersect_mesh_kd(origin, direction, kd, config: RenderConfig,
                      t_init=None, active=None) -> TriHit:
    """Dispatch on the configured traversal variant (the reference's
    ``shortstack`` key-L toggle, pathtrace.cu:1653-1680)."""
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    if config.fat_rows and kd.fat is not None:
        return traverse_fatrow(origin, direction, kd, config,
                               t_init=t_init, active=active)
    if config.short_stack:
        if config.push_down_restart:
            return traverse_pushdown(origin, direction, kd, config,
                                     t_init=t_init)
        return traverse_shortstack(origin, direction, kd, config, t_init=t_init)
    return traverse_skiplink(origin, direction, kd, config, t_init=t_init)

"""Cluster-MXU triangle intersection: the TPU-native answer to KD traversal.

The reference accelerates intersection with a per-thread KD walk
(traverseKDbareShortHybrid, pathtrace.cu:1023-1235) — pointer chasing
that GPUs do well. On TPU every data-dependent row gather costs a flat
~7 ns/lane (measured, exp/gather_micro.py) while a Möller–Trumbore test
in MXU matmul form costs ~0.014 ns/ray-tri (exp/cluster_micro.py, v5e,
f32): ONE gather buys ~500 triangle tests. So instead of walking a tree
per ray, this module:

1. HOST: orders triangles by Morton code of their centroid and chunks
   them into fixed blocks of B (pad last); per block it keeps the MT
   weight matrix [16, 4B] (ops/mxu_bf form) and a bounding sphere.
2. SORT (optional, per bounce): the wavefront is coherence-sorted
   (direction octant + origin Morton, ops/traverse._coherence_key) with
   one multi-operand lax.sort so each ray tile shares a small union of
   feasible blocks; results are unsorted by a second keyed sort.
3. CULL: a Pallas kernel computes, per ray tile, the tile-min
   conservative entry bound into every block's bounding sphere — the
   [rays, blocks] pair matrix lives only in VMEM; HBM sees just the
   [tiles, blocks] result. (A previous jnp version materialized the
   [N, K] matrix in HBM ~2 GB at dragon scale and cost 300 ms/bounce.)
4. SELECT: per tile, feasible blocks are ordered by entry bound. The
   round axis is padded to a fixed R_max by REPEATING the last feasible
   block id — Pallas skips the HBM copy when consecutive grid steps map
   to the same block, so padded rounds cost only a skipped grid cell.
5. INTERSECT: a Pallas kernel over grid (tiles, rounds) streams each
   tile's selected weight blocks from HBM by scalar-prefetched index
   (per-tile block lists — the block-sparse matmul pattern), running
   the mxu_bf epilogue with a per-ray running min. A per-tile early
   exit skips the matmul once every live ray's best t is at or below
   the next round's entry bound — which is also how tiles whose
   feasible count < R_max stop: their padded rounds carry a +inf bound.
6. EXACTNESS: a tile whose feasible count exceeded R_max exposes the
   entry bound of its first UNSELECTED block; any ray that could still
   be beaten by it is FLAGGED, and a bounded second pass over all
   blocks (same kernel, full block list, t0 = the found best) repairs
   it under lax.cond. flag == False proves the result equals brute
   force, so images are exact, not approximate.

No per-ray gathers, no dynamic shapes: culling is one fused kernel,
selection is a tiny per-tile argsort, intersection is MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit
from kdtreepathtraceroptimization_tpu.ops import mxu_bf


class ClusterMesh(NamedTuple):
    """Morton-blocked triangle table + per-block bounds.

    ``tris`` is a MeshSoA in block order (padded with degenerate
    triangles that can never win a hit) — hit triangle ids index it
    directly, so no per-bounce id remap is needed.

    The block axis K is padded to a multiple of 128 (lane width) with
    never-feasible sentinel blocks (r2 = -1) and all-zero weight blocks
    so the cull kernel's [8, K] tables and the [G, K] entry matrix tile
    cleanly.
    """

    w: jax.Array        # [Kpad, 16, 4B] f32 MT weight blocks (centered)
    blk: jax.Array      # [8, Kpad] f32 rows: cx cy cz radius |c|^2 r2 0 0
    cull_w: jax.Array   # [8, 2*Kpad] f32 matmul weights for (d.c | o.c)
    slab: jax.Array     # [8, Kpad] f32 AABB slab table: rows
                        # [lo_x lo_y lo_z hi_x hi_y hi_z 0 0]
                        # (ops/walk.py VPU slab cull)
    center_shift: jax.Array  # [3] f32 shift applied to tris/rays (precision)
    root_min: jax.Array  # [3] f32 sphere-union lower corner (centered)
    root_max: jax.Array  # [3] f32 sphere-union upper corner (centered)
    tris: "MeshSoA"     # block-ordered padded mesh  # noqa: F821
    block: int          # B, triangles per block
    n_real_blocks: int  # K before lane padding

    @property
    def n_blocks(self) -> int:
        return int(self.blk.shape[1])


def _morton3(x: np.ndarray) -> np.ndarray:
    """[N, 3] float -> 63-bit Morton codes (21 bits/axis)."""
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    span = np.maximum(hi - lo, 1e-12)
    q = np.clip(((x - lo) / span * ((1 << 21) - 1)), 0, (1 << 21) - 1)
    q = q.astype(np.uint64)

    def spread(v):
        v &= np.uint64(0x1FFFFF)
        v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
        return v

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
        | (spread(q[:, 2]) << np.uint64(2))
    )


def _kd_leaf_order(v0, v1, v2, cap: int) -> np.ndarray:
    """Median-split KD partition into leaves of <= cap triangles.

    Returns [n_leaves, cap] triangle indices, each leaf padded to cap
    by repeating its last member (marked degenerate by the caller).
    Leaf AABBs are spatially tight and ~disjoint, which cuts the
    per-ray feasible-block count ~2.5x vs Morton chunking (measured,
    exp/kdblock_sim.py: 5.69 -> 2.24 mean on cornell+dragon). Split
    semantics follow the reference's median build
    (/root/reference/src/KDtree.cpp split) but on the widest centroid
    axis with a leaf cap instead of a fixed depth.
    """
    cent = (v0 + v1 + v2) / 3.0
    out = []

    def rec(idx):
        if idx.size <= cap:
            out.append(np.concatenate(
                [idx, np.full(cap - idx.size, idx[-1], np.int64)]))
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        med = np.argsort(c[:, ax], kind="stable")
        half = idx.size // 2
        rec(idx[med[:half]])
        rec(idx[med[half:]])

    rec(np.arange(v0.shape[0], dtype=np.int64))
    return np.stack(out)


def build_cluster_mesh(mesh, block: int = 256,
                       method: str = "kd") -> ClusterMesh:
    """Host build: cluster triangles into blocks of ``block``,
    precompute MT weights + bounds. O(T log T), numpy.

    ``method``: "kd" (default) = median-split spatial leaves, tight
    ~disjoint AABBs; "morton" = Z-order chunks (round-2 layout, looser
    bounds, zero padding overhead).
    """
    from kdtreepathtraceroptimization_tpu.scene.structs import MeshSoA

    v0 = np.asarray(mesh.v0, np.float32)
    v1 = np.asarray(mesh.v1, np.float32)
    v2 = np.asarray(mesh.v2, np.float32)
    t_count = v0.shape[0]

    if method == "kd":
        leaf = _kd_leaf_order(v0, v1, v2, block)  # [K, block]
        idx = leaf.reshape(-1)
        # a slot is padding iff it repeats the slot before it (leaves
        # pad by repeating their last member)
        real = np.ones(idx.shape[0], bool)
        real[1:] = idx[1:] != idx[:-1]
    else:
        cent = (v0 + v1 + v2) / 3.0
        order = np.argsort(_morton3(cent), kind="stable")
        pad = (-t_count) % block
        idx = np.concatenate([order, np.full(pad, order[-1], np.int64)])
        real = np.ones(idx.shape[0], bool)
        real[t_count:] = False

    # Padding slots duplicate a real triangle but with all-equal
    # vertices (degenerate -> MT determinant 0 -> culled, never wins).
    dv0 = v0[idx].copy()
    dv1 = v1[idx].copy()
    dv2 = v2[idx].copy()
    dv1[~real] = dv0[~real]
    dv2[~real] = dv0[~real]

    tris = MeshSoA(
        v0=dv0, v1=dv1, v2=dv2,
        n0=np.asarray(mesh.n0)[idx], n1=np.asarray(mesh.n1)[idx],
        n2=np.asarray(mesh.n2)[idx],
        material_id=np.asarray(mesh.material_id)[idx],
        shape_id=np.asarray(mesh.shape_id)[idx],
        shape_bbox_min=mesh.shape_bbox_min,
        shape_bbox_max=mesh.shape_bbox_max,
    )

    center_shift = 0.5 * (
        np.minimum(dv0.min(0), np.minimum(dv1.min(0), dv2.min(0)))
        + np.maximum(dv0.max(0), np.maximum(dv1.max(0), dv2.max(0)))
    ).astype(np.float32)
    cv0, cv1, cv2 = dv0 - center_shift, dv1 - center_shift, dv2 - center_shift

    k = cv0.shape[0] // block
    b0 = cv0.reshape(k, block, 3)
    b1 = cv1.reshape(k, block, 3)
    b2 = cv2.reshape(k, block, 3)
    lo = np.minimum(b0.min(1), np.minimum(b1.min(1), b2.min(1)))
    hi = np.maximum(b0.max(1), np.maximum(b1.max(1), b2.max(1)))
    centers = (0.5 * (lo + hi)).astype(np.float32)
    radii = (0.5 * np.linalg.norm(hi - lo, axis=1) + 1e-5).astype(np.float32)

    # Pure-numpy weight build (mxu_bf.tri_weights math): the host build
    # must not touch jnp — under a tunneled backend eager ops round-trip
    # the device and the [10, 4T] result transfer takes minutes.
    e1 = cv1 - cv0
    e2 = cv2 - cv0
    nrm = np.cross(e1, e2)
    c = np.sum(cv0 * nrm, axis=1)
    e2xv0 = np.cross(e2, cv0)
    v0xe1 = np.cross(cv0, e1)
    tq = cv0.shape[0]
    z3 = np.zeros((tq, 3), np.float32)
    z1 = np.zeros((tq, 1), np.float32)
    one = np.ones((tq, 1), np.float32)
    w_a = np.concatenate([z3, -nrm, z3, z1], axis=1)
    w_t = np.concatenate([nrm, z3, z3, -c[:, None] * one], axis=1)
    w_u = np.concatenate([z3, -e2xv0, e2, z1], axis=1)
    w_v = np.concatenate([z3, -v0xe1, -e1, z1], axis=1)
    w = np.concatenate([w_a, w_t, w_u, w_v], axis=0).T.astype(np.float32)
    w = (
        w.reshape(10, 4, k, block)
        .transpose(2, 0, 1, 3)
        .reshape(k, 10, 4 * block)
    )
    w = np.concatenate([w, np.zeros((k, 6, 4 * block), np.float32)], axis=1)

    # Lane-pad the block axis with never-feasible sentinels (r2 = -1)
    # and zero weights (determinant 0 -> never hit if ever streamed).
    kpad = (-k) % 128
    if kpad:
        w = np.concatenate(
            [w, np.zeros((kpad, 16, 4 * block), np.float32)], axis=0
        )
    kp = k + kpad
    blk = np.zeros((8, kp), np.float32)
    blk[0:3, :k] = centers.T
    blk[3, :k] = radii
    blk[4, :k] = np.sum(centers * centers, axis=1)
    blk[5, :k] = radii * radii
    blk[5, k:] = -1.0  # sentinel: never feasible
    cull_w = np.zeros((8, 2 * kp), np.float32)
    cull_w[3:6, :k] = centers.T      # d . c
    cull_w[0:3, kp:kp + k] = centers.T  # o . c

    # AABB slab table (ops/walk.py VPU cull): rows 0-2 = lo, 3-5 = hi;
    # sentinel columns stay 0 and are rejected by blk row 5 (r2 = -1).
    slab = np.zeros((8, kp), np.float32)
    slab[0:3, :k] = lo.T
    slab[3:6, :k] = hi.T

    root_min = (centers - radii[:, None]).min(0)
    root_max = (centers + radii[:, None]).max(0)

    return ClusterMesh(
        w=jnp.asarray(w),
        blk=jnp.asarray(blk),
        cull_w=jnp.asarray(cull_w),
        slab=jnp.asarray(slab),
        center_shift=jnp.asarray(center_shift),
        root_min=jnp.asarray(root_min),
        root_max=jnp.asarray(root_max),
        tris=jax.tree.map(jnp.asarray, tris),
        block=block,
        n_real_blocks=k,
    )


# ---------------------------------------------------------------------------
# Cull: tile-min entry bounds. Pallas on TPU (nothing [N, K]-shaped in
# HBM), jnp mirror elsewhere.
# ---------------------------------------------------------------------------


def _entry_math(o, d, t0, act, radius, cc, r2, p1, p2):
    """Shared cull math: conservative entry bound per (ray, block) pair,
    +inf where the pair is infeasible (sphere missed / entirely behind /
    beyond the ray's current bound / dead lane / sentinel block).

    entry(ray, k) = max(t_ca - radius, 0) with t_ca the ray parameter of
    the closest approach to block k's bounding-sphere center.
    """
    od = jnp.sum(o * d, axis=1, keepdims=True)
    oo = jnp.sum(o * o, axis=1, keepdims=True)
    t_ca = p1 - od
    dline2 = cc - 2.0 * p2 + oo - t_ca * t_ca
    entry = jnp.maximum(t_ca - radius, 0.0)
    feasible = (
        (dline2 <= r2)
        & (t_ca + radius > 0.0)
        & (entry < t0)
        & act
        & (r2 >= 0.0)
    )
    return jnp.where(feasible, entry, BIG)


def _cull_kernel(x_ref, cw_ref, blk_ref, out_ref, *, kp, tile):
    """Per ray tile: tile-min entry bound into every block, in 8
    subtile rows (output blocks need a sublane dim divisible by 8).
    [subtile, K] intermediates live in VMEM only, reused across the
    unrolled subtile loop."""
    sub = tile // 8
    for m in range(8):
        x = x_ref[m * sub:(m + 1) * sub, :]  # [sub, 8] = o(3) d(3) t0 act
        prod = jax.lax.dot_general(
            x, cw_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [sub, 2K] = (d.c | o.c)
        entry = _entry_math(
            x[:, 0:3], x[:, 3:6], x[:, 6:7], x[:, 7:8] > 0.0,
            blk_ref[3:4, :], blk_ref[4:5, :], blk_ref[5:6, :],
            prod[:, :kp], prod[:, kp:],
        )
        out_ref[m:m + 1, :] = jnp.min(entry, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _cull_pallas(x, cull_w, blk, tile: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = x.shape[0]
    kp = blk.shape[1]
    g = n // tile
    kernel = functools.partial(_cull_kernel, kp=kp, tile=tile)
    out = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, 2 * kp), lambda i: (0, 0)),
            pl.BlockSpec((8, kp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, kp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((8 * g, kp), jnp.float32),
        interpret=interpret,
    ), x, cull_w, blk)
    return out.reshape(g, 8, kp).min(axis=1)


def _cull_ref(x, cull_w, blk, tile: int):
    """jnp mirror of the cull kernel (CPU path / oracle)."""
    n = x.shape[0]
    kp = blk.shape[1]
    prod = x @ cull_w
    entry = _entry_math(
        x[:, 0:3], x[:, 3:6], x[:, 6:7], x[:, 7:8] > 0.0,
        blk[3:4, :], blk[4:5, :], blk[5:6, :], prod[:, :kp], prod[:, kp:],
    )
    return entry.reshape(n // tile, tile, kp).min(axis=1)


def _select(tile_entry, rounds: int):
    """Entry-ordered per-tile block lists, padded by repetition.

    -> (sel [G, R] int32, lb [G, R] f32, lb_over [G] f32). Padded
    rounds repeat the LAST feasible block id (so consecutive grid steps
    keep the same HBM block and Pallas skips the copy) with lb = +inf
    (so the early exit skips their compute). ``lb_over`` is the entry
    bound of the first unselected feasible block (+inf when every
    feasible block was selected) — the exactness flag threshold.
    """
    g, kp = tile_entry.shape
    rounds = min(rounds, kp)
    order = jnp.argsort(tile_entry, axis=1)
    sorted_e = jnp.take_along_axis(tile_entry, order, axis=1)
    count = jnp.sum(sorted_e < BIG, axis=1).astype(jnp.int32)  # [G]
    sel = order[:, :rounds].astype(jnp.int32)
    lb = sorted_e[:, :rounds]
    jj = jnp.arange(rounds, dtype=jnp.int32)[None, :]
    last = jnp.clip(count - 1, 0, rounds - 1)[:, None]
    last_sel = jnp.take_along_axis(sel, last, axis=1)
    live = jj < count[:, None]
    sel = jnp.where(live, sel, last_sel)
    lb = jnp.where(live, lb, BIG)
    if rounds < kp:
        lb_over = jnp.where(count > rounds, sorted_e[:, rounds], BIG)
    else:
        lb_over = jnp.full((g,), BIG, jnp.float32)
    return sel, lb, lb_over


# ---------------------------------------------------------------------------
# Pallas kernel: grid (tiles, rounds), scalar-prefetched block ids
# ---------------------------------------------------------------------------


def _cluster_kernel(sel_ref, lb_ref, r_ref, t0_ref, act_ref, w_ref,
                    bt_ref, btri_ref, *, block, tile, rounds):
    import jax.experimental.pallas as pl

    g = pl.program_id(0)
    rr = pl.program_id(1)

    @pl.when(rr == 0)
    def _init():
        bt_ref[:, :] = t0_ref[:, :]
        btri_ref[:, :] = jnp.full((tile, 1), -1, jnp.int32)

    bt = bt_ref[:, :]  # [tile, 1]
    act = act_ref[:, :] > 0
    # Early exit: once every live ray's best t is <= this round's entry
    # bound, no remaining (entry-ordered) block can improve the tile.
    # Padded rounds carry lb = +inf, so they always skip.
    lb = lb_ref[g, rr]
    live = jnp.any(act & (bt[:, 0:1] > lb))

    @pl.when(live)
    def _work():
        prod = jax.lax.dot_general(
            r_ref[:, :], w_ref[0, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile, 4B]
        t = mxu_bf._epilogue(prod, block, bt)
        loc = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
        lt = jnp.min(t, axis=1, keepdims=True)
        better = lt < bt
        tri_idx = sel_ref[g, rr] * block + loc
        bt_ref[:, :] = jnp.where(better, lt, bt)
        btri_ref[:, :] = jnp.where(better, tri_idx, btri_ref[:, :])


def _sweep_kernel(r_ref, t0_ref, w_ref, bt_ref, btri_ref, *, block, tile):
    """Repair sweep: every block for every tile, t-bounded epilogue.
    No scalar prefetch (a [G, K] block list would overflow SMEM) and no
    entry ordering — it only runs when a ray flags, which the main
    pass's selection makes rare."""
    import jax.experimental.pallas as pl

    jj = pl.program_id(1)

    @pl.when(jj == 0)
    def _init():
        bt_ref[:, :] = t0_ref[:, :]
        btri_ref[:, :] = jnp.full((tile, 1), -1, jnp.int32)

    prod = jax.lax.dot_general(
        r_ref[:, :], w_ref[0, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bt = bt_ref[:, :]
    t = mxu_bf._epilogue(prod, block, bt)
    loc = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
    lt = jnp.min(t, axis=1, keepdims=True)
    better = lt < bt
    bt_ref[:, :] = jnp.where(better, lt, bt)
    btri_ref[:, :] = jnp.where(better, jj * block + loc, btri_ref[:, :])


@functools.partial(jax.jit, static_argnames=("tile", "block", "interpret"))
def _sweep_pallas(r, t0, w, tile: int, block: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = r.shape[0]
    g = n // tile
    k = w.shape[0]
    kernel = functools.partial(_sweep_kernel, block=block, tile=tile)
    bt, btri = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=(g, k),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, 16, 4 * block), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    ), r, t0.reshape(n, 1), w)
    return bt.reshape(n), btri.reshape(n)


@functools.partial(jax.jit, static_argnames=("tile", "block", "rounds",
                                             "interpret"))
def _cluster_pallas(sel, lb, r, t0, act, w, tile: int, block: int,
                    rounds: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = r.shape[0]
    g = n // tile
    kernel = functools.partial(_cluster_kernel, block=block, tile=tile,
                               rounds=rounds)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # sel, lb
        grid=(g, rounds),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i, j, sel, lb: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j, sel, lb: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j, sel, lb: (i, 0)),
            pl.BlockSpec((1, 16, 4 * block),
                         lambda i, j, sel, lb: (sel[i, j], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i, j, sel, lb: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j, sel, lb: (i, 0)),
        ],
    )
    bt, btri = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    ), sel, lb, r, t0.reshape(n, 1), act.reshape(n, 1), w)
    return bt.reshape(n), btri.reshape(n)


def _cluster_ref(sel, lb, r, t0, act, w, tile: int, block: int,
                 rounds: int):
    """jnp reference of the round loop (CPU path / oracle). Padded
    rounds re-test the repeated last block — idempotent under the
    running min, so results match the early-exiting kernel exactly."""
    n = r.shape[0]
    g = n // tile
    rt = r.reshape(g, tile, 16)

    def body(carry, rr):
        bt, btri = carry  # [G, tile]
        wsel = w[sel[:, rr]]  # [G, 16, 4B]
        prod = jnp.einsum("gtf,gfc->gtc", rt, wsel)
        t = mxu_bf._epilogue(
            prod.reshape(g * tile, 4 * block), block, bt.reshape(-1)
        ).reshape(g, tile, block)
        loc = jnp.argmin(t, axis=2)
        lt = jnp.min(t, axis=2)
        better = lt < bt
        tri_idx = sel[:, rr][:, None] * block + loc
        return (
            jnp.where(better, lt, bt),
            jnp.where(better, tri_idx.astype(jnp.int32), btri),
        ), None

    init = (
        t0.reshape(g, tile),
        jnp.full((g, tile), -1, jnp.int32),
    )
    (bt, btri), _ = jax.lax.scan(body, init, jnp.arange(rounds))
    return bt.reshape(n), btri.reshape(n)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def intersect_mesh_cluster(origin, direction, cm: ClusterMesh, config,
                           t_init=None, active=None,
                           interpret: bool = False) -> TriHit:
    """Nearest-hit over the cluster mesh; exact (brute-equal) results.

    See module docstring. ``t_init`` bounds the search (analytic geoms
    first); ``active`` lanes skip culling and can never flag.
    """
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    n = origin.shape[0]
    tile = config.cluster_tile
    rounds = config.cluster_rounds
    block = cm.block
    kp = cm.n_blocks
    rounds = min(rounds, kp)

    origin = jnp.asarray(origin, jnp.float32) - cm.center_shift
    direction = jnp.asarray(direction, jnp.float32)
    t0 = jnp.full((n,), BIG, jnp.float32) if t_init is None else t_init
    act = jnp.ones((n,), bool) if active is None else active

    pad = (-n) % tile
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), jnp.float32)])
        direction = jnp.concatenate([direction, jnp.zeros((pad, 3), jnp.float32)])
        t0 = jnp.concatenate([t0, jnp.zeros((pad,), jnp.float32)])
        act = jnp.concatenate([act, jnp.zeros((pad,), bool)])
    npad = origin.shape[0]
    lane = jnp.arange(npad, dtype=jnp.int32)

    # Coherence sort (one multi-operand lax.sort): tiles of rays with a
    # shared direction octant + origin cell walk a small shared block
    # union; the wavefront after a few bounces is scrambled without it.
    do_sort = getattr(config, "cluster_sort", True)
    if do_sort:
        from kdtreepathtraceroptimization_tpu.ops.traverse import _coherence_key

        ckey = _coherence_key(origin, direction, act, cm.root_min, cm.root_max)
        (_, lane, o0, o1, o2, d0, d1, d2, t0, acti) = jax.lax.sort(
            (ckey, lane,
             origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2],
             t0, act.astype(jnp.int32)),
            num_keys=1,
        )
        origin = jnp.stack([o0, o1, o2], axis=1)
        direction = jnp.stack([d0, d1, d2], axis=1)
        act = acti > 0

    # Dead lanes are removed from the MT itself (not just the cull):
    # direction 0 -> every determinant 0 -> all culled, exactly like
    # the pad rays. (The Pallas path's early exit would skip them, but
    # the jnp reference round loop has no early exit.)
    direction = jnp.where(act[:, None], direction, 0.0)
    actf = act.astype(jnp.float32)
    x = jnp.concatenate(
        [origin, direction, t0[:, None], actf[:, None]], axis=1
    )  # [npad, 8]

    on_tpu = jax.default_backend() == "tpu" or interpret
    if on_tpu:
        tile_entry = _cull_pallas(x, cm.cull_w, cm.blk, tile, interpret)
    else:
        tile_entry = _cull_ref(x, cm.cull_w, cm.blk, tile)
    sel, lb, lb_over = _select(tile_entry, rounds)
    rounds = sel.shape[1]

    r = mxu_bf.ray_features(origin, direction)
    r = jnp.concatenate([r, jnp.zeros((npad, 6), jnp.float32)], axis=1)

    if on_tpu:
        bt, btri = _cluster_pallas(sel, lb, r, t0, actf, cm.w,
                                   tile, block, rounds, interpret)
    else:
        bt, btri = _cluster_ref(sel, lb, r, t0, actf, cm.w,
                                tile, block, rounds)

    # Exactness repair: any ray that could still be beaten by its
    # tile's first unselected block reruns against ALL blocks, bounded
    # by its best t. (Only tiles whose feasible count exceeded R_max
    # have a finite threshold, so this fires rarely by construction.)
    over = jnp.repeat(lb_over, tile)
    flagged = act & (over < bt)

    def repair(args):
        bt, btri = args
        if on_tpu:
            bt2, btri2 = _sweep_pallas(r, bt, cm.w, tile, block, interpret)
        else:
            g = npad // tile
            all_sel = jnp.broadcast_to(
                jnp.arange(kp, dtype=jnp.int32)[None, :], (g, kp)
            )
            bt2, btri2 = _cluster_ref(all_sel, None, r, bt, actf,
                                      cm.w, tile, block, kp)
        keep = btri2 >= 0
        return jnp.where(keep, bt2, bt), jnp.where(keep, btri2, btri)

    bt, btri = jax.lax.cond(
        jnp.any(flagged), repair, lambda a: a, (bt, btri)
    )

    if do_sort:
        _, bt, btri = jax.lax.sort((lane, bt, btri), num_keys=1)

    bt, btri = bt[:n], btri[:n]
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))

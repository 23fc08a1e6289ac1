"""Pair-list intersection: per-ray-optimal MXU scheduling.

Every tile-shared design measured on cornell+dragon (ops/cluster.py
budget+repair, ops/binned.py argmin bins, ops/walk.py exact walk) pays
per tile for the UNION of its rays' feasible blocks — 65-300 blocks
against a per-ray feasible count of just 2.24 (KD-leaf blocks, AABB
culls; exp/kdblock_sim.py). The union inflation is irreducible by
reordering (exp/bin_stats2.py tried four orderings) because diffuse
wavefronts are genuinely incoherent: the walk kernel measures 469
ns/ray on the real v5e where the per-ray-optimal matmul cost is ~12 ns.

This module schedules (ray, block) PAIRS instead:

  1. extract   (Pallas): per ray, its F smallest-entry feasible blocks
               (iterated masked argmin over the slab-cull entries) plus
               the (F+1)-th entry bound ``lb_over`` (the exactness
               proof threshold) and the feasible count.
  2. group     ONE 1-operand lax.sort of packed (block id | pair idx)
               keys groups pairs by block (sentinel slots sink to the
               end) and carries the inverse mapping in the key's low
               bits; one row gather fetches the slot records.
  3. test      (Pallas): one grid cell per 256-pair tile of the sorted
               order; a while_loop walks the tile's contiguous
               same-block RUNS (mean ~1.1/tile), double-buffering each
               run's [16, 4B] Moller-Trumbore weight block from HBM
               behind the MXU round; per-slot nearest (t, loc).
  4. reduce    results return to [N, F] slot order (one keyed sort) and
               fold with a per-ray min — deterministic, no scatter.
  5. prove     a ray is EXACT when its best t <= lb_over (no untested
               block's entry can beat it). Unproven rays (measured
               ~4.5% at F=4) are compacted and rerun with a deeper
               window (slots F..F2); the residual tail (~0%) falls back
               to the exhaustive walk kernel. Exact by construction.

The traversal contract being replaced: traverseKDbareShortHybrid,
/root/reference/src/pathtrace.cu:1023-1235.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from kdtreepathtraceroptimization_tpu.ops import walk as wk
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit

# second-pass window depth and compaction buffer (see module docstring).
# Tuned on the cornell+dragon diffuse wave (exp/pairs_stats.py):
# unproven after pass 1 = 5.9% (38k of 640k) with median feasible count
# 9 and p99 16 — a 12-deep window fully covers 82% of unproven rays and
# proves most of the rest via lb_over, while costing 2.7x fewer slots
# than the previous F2=20/65536 configuration; the exhaustive-walk tail
# picks up the residue either way.
F2 = 12
REPAIR_LANES = 65536
WALK_LANES = 8192


# ---------------------------------------------------------------------------
# 1. extraction
# ---------------------------------------------------------------------------


_IDX_BITS = 10  # block id bits packed into the key's low mantissa


def _extract_math(x, slab, blk, kp, F):
    """[sub, 16] features + [8, K] slab table -> per-ray top-F
    entry-ordered feasible block ids [sub, F] (kp where exhausted),
    lb_over [sub, 1] (a conservative (F+1)-th smallest entry; BIG when
    none) and feasible count [sub, 1].

    Selection packs (entry, block id) into ONE u32 key — entries are
    non-negative floats, whose bit patterns order numerically, with the
    block id in the low mantissa bits — so each slot costs one
    min-reduce plus one equality mask instead of an argmin + iota
    compare (the per-iteration argmin dominated the kernel: 22 ms/call
    at dragon scale before this). Keys are unique (id in the low bits),
    ties break toward the smaller block id exactly like argmin, and
    lb_over's mantissa truncation only LOWERS the proof bound —
    conservative."""
    assert kp <= (1 << _IDX_BITS)
    entry = wk._slab_entry_math(x, slab, blk, kp)  # [sub, K]
    count = jnp.sum((entry < BIG).astype(jnp.int32), axis=1, keepdims=True)
    # int32 keys: entries are non-negative floats whose bit patterns
    # order numerically even as SIGNED ints (sign bit 0), and Mosaic
    # has no unsigned reductions.
    cols = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 1)
    lowmask = jnp.int32((1 << _IDX_BITS) - 1)
    key = (jax.lax.bitcast_convert_type(entry, jnp.int32) & ~lowmask) | cols
    # host-side constant (Mosaic rejects scalar bitcasts in-kernel)
    import numpy as _np
    big_key = jnp.int32(
        int(_np.float32(BIG).view(_np.int32)) & ~((1 << _IDX_BITS) - 1)
    )
    dead = jnp.int32(0x7FFFFFFF)
    ids = []
    for _ in range(F):
        m = jnp.min(key, axis=1, keepdims=True)
        ids.append(jnp.where(m < big_key, m & lowmask, jnp.int32(kp)))
        key = jnp.where(key == m, dead, key)
    m = jnp.min(key, axis=1, keepdims=True)
    lb_over = jnp.where(
        m < big_key,
        jax.lax.bitcast_convert_type(m & ~lowmask, jnp.float32),
        jnp.float32(BIG),
    )
    return jnp.concatenate(ids, axis=1), lb_over, count


def _extract_kernel(x_ref, slab_ref, blk_ref, ids_ref, lbov_ref, cnt_ref,
                    *, kp, tile, F):
    sub = tile // 8
    for m in range(8):
        x = x_ref[m * sub:(m + 1) * sub, :]
        ids, lbov, cnt = _extract_math(x, slab_ref[:, :], blk_ref, kp, F)
        ids_ref[m * sub:(m + 1) * sub, :] = ids
        lbov_ref[m * sub:(m + 1) * sub, :] = lbov
        cnt_ref[m * sub:(m + 1) * sub, :] = cnt


@functools.partial(jax.jit, static_argnames=("tile", "F", "interpret"))
def _extract_pallas(x, slab, blk, tile: int, F: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = x.shape[0]
    kp = blk.shape[1]
    g = n // tile
    kernel = functools.partial(_extract_kernel, kp=kp, tile=tile, F=F)
    ids, lbov, cnt = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i: (i, 0)),
            pl.BlockSpec((8, kp), lambda i: (0, 0)),
            pl.BlockSpec((8, kp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, F), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, F), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(x, slab, blk)
    return ids, lbov.reshape(n), cnt.reshape(n)


def _extract_ref(x, slab, blk, F):
    """jnp mirror (CPU path / oracle)."""
    kp = blk.shape[1]
    ids, lbov, cnt = _extract_math(x, slab, blk, kp, F)
    return ids, lbov.reshape(-1), cnt.reshape(-1)


# ---------------------------------------------------------------------------
# 2-4. one pair pass: group, test, reduce
# ---------------------------------------------------------------------------


def _feat16(od):
    """[p, 8] (o, d, t0, validf) -> [p, 16] MT features [o d oxd 1]*valid.

    Computed from the 8-float slot record instead of gathering the full
    16-float feature row per slot (halves the align gather traffic)."""
    o3, d3 = od[:, 0:3], od[:, 3:6]
    m = jnp.stack([
        o3[:, 1] * d3[:, 2] - o3[:, 2] * d3[:, 1],
        o3[:, 2] * d3[:, 0] - o3[:, 0] * d3[:, 2],
        o3[:, 0] * d3[:, 1] - o3[:, 1] * d3[:, 0],
    ], axis=1)
    one = od[:, 7:8]
    z = jnp.zeros((od.shape[0], 6), od.dtype)
    return jnp.concatenate([o3, d3, m, one, z], axis=1) * one


def _pair_runs_kernel(blk3_ref, blkcol_ref, od_ref, w_hbm, t_ref, loc_ref,
                      wbuf, sem, *, block, ptile, kreal):
    """Per sorted-pair tile: walk the tile's block RUNS.

    The global block-id sort leaves each tile's pairs grouped into a
    few contiguous same-block runs (mean ~1.1: mean pairs/block far
    exceeds the tile size, so most tiles are one run plus at most one
    boundary split). A while_loop walks the runs: each round DMAs the
    run's [16, 4B] Moller-Trumbore weight block (prefetching the next
    run's behind the matmul — the ops/walk.py double-buffer pattern),
    one MXU round over the WHOLE tile, and a row-range select merges
    the run's rows. This replaces the round-3 mono-block layout whose
    per-block tile alignment needed a scatter+cummax align chain and a
    sentinel-padded [P + (K+1)*ptile] slot array — the runs layout
    works directly on the dense sorted order. Sentinel pairs
    (id >= kreal) sort to the global tail; their rows keep the BIG/0
    initialization and the loop stops at the first sentinel run."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_ref[:, :] = jnp.full((ptile, 1), BIG, jnp.float32)
    loc_ref[:, :] = jnp.zeros((ptile, 1), jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ptile, 1), 0)
    blkcol = blkcol_ref[:, :]
    od = od_ref[:, :]
    feat = _feat16(od)
    t0col = od[:, 6:7]

    def dma(slot, b):
        return pltpu.make_async_copy(w_hbm.at[b], wbuf.at[slot], sem.at[slot])

    b0 = blk3_ref[0, 0, 0]

    @pl.when(b0 < kreal)
    def _():
        dma(0, b0).start()

    def cond(st):
        r0, b, slot = st
        return (r0 < ptile) & (b < kreal)

    def body(st):
        r0, b, slot = st
        # sorted order -> the run of block b starting at r0 is
        # contiguous; its length is a single VPU count.
        cnt = jnp.sum(((blkcol == b) & (rows >= r0)).astype(jnp.int32))
        r1 = r0 + cnt
        b_next = blk3_ref[0, 0, jnp.minimum(r1, ptile - 1)]

        # The prefetch predicate equals cond() of the next state, so
        # every started DMA is waited by exactly one later round — no
        # drain pass is needed.
        @pl.when((r1 < ptile) & (b_next < kreal))
        def _():
            dma(1 - slot, b_next).start()

        dma(slot, b).wait()
        prod = jax.lax.dot_general(
            feat, wbuf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = mxu_bf._epilogue(prod, block, t0col)
        tmin = jnp.min(t, axis=1, keepdims=True)
        lmin = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
        in_run = (rows >= r0) & (rows < r1)
        t_ref[:, :] = jnp.where(in_run, tmin, t_ref[:, :])
        loc_ref[:, :] = jnp.where(in_run, lmin, loc_ref[:, :])
        return r1, b_next, 1 - slot

    jax.lax.while_loop(cond, body, (jnp.int32(0), b0, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("block", "ptile", "kreal",
                                             "interpret"))
def _pair_runs_pallas(blk_s, od, w, block: int, ptile: int, kreal: int,
                      interpret: bool):
    """blk_s [P] i32 (block id per sorted pair, ascending), od [P, 8]
    -> per-pair nearest (t [P], loc [P]) within its block."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = od.shape[0]
    g = s // ptile
    kernel = functools.partial(_pair_runs_kernel, block=block, ptile=ptile,
                               kreal=kreal)
    t, loc = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, ptile), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ptile, 1), lambda i: (i, 0)),
            pl.BlockSpec((ptile, 8), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ptile, 1), lambda i: (i, 0)),
            pl.BlockSpec((ptile, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 4 * block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(blk_s.reshape(g, 1, ptile), blk_s.reshape(s, 1), od, w)
    return t.reshape(s), loc.reshape(s)


def _pair_slots_ref(ids, od8, w, block, kreal, chunk: int = 4096):
    """jnp mirror (CPU path / oracle): per-slot nearest (t, loc) in
    [n, F] slot order directly — no sorting, per-slot weight gather.
    Chunked with lax.map so the [chunk, 16, 4B] gathered weights stay
    bounded at any wavefront size."""
    n, F = ids.shape
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        ids = jnp.concatenate(
            [ids, jnp.full((pad, F), kreal, ids.dtype)])
        od8 = jnp.concatenate([od8, jnp.zeros((pad, 8), od8.dtype)])

    def one(args):
        ids_c, od_c = args
        feat = _feat16(od_c)
        t0 = od_c[:, 6]
        ts, locs = [], []
        for f in range(F):
            blk = ids_c[:, f]
            ok = blk < kreal
            wsel = w[jnp.where(ok, blk, 0)]               # [chunk, 16, 4B]
            prod = jnp.einsum("nf,nfc->nc", feat, wsel)
            t = mxu_bf._epilogue(prod, block, t0)
            tmin = jnp.min(t, axis=1)
            loc = jnp.argmin(t, axis=1).astype(jnp.int32)
            ts.append(jnp.where(ok, tmin, BIG))
            locs.append(jnp.where(ok, loc, 0))
        return jnp.stack(ts, axis=1), jnp.stack(locs, axis=1)

    t, loc = jax.lax.map(
        one, (ids.reshape(-1, chunk, F), od8.reshape(-1, chunk, 8)))
    return (t.reshape(n + pad, F)[:n], loc.reshape(n + pad, F)[:n])


def _pair_pass(ids, od8, cm, ptile, kreal, on_tpu, interpret):
    """Test every (ray, block) pair in ``ids`` [n, F]; return per-ray
    (t_best [n], tri_best [n]) over those pairs (BIG/-1 where none).

    ids == kp marks empty slots. od8 [n, 8] per-ray slot record
    (o, d, t0, activef) — t0 bounds the epilogue.

    TPU path: ONE 1-operand packed-key sort (block id in the high
    bits, pair index in a pow2 low field) groups pairs by block while
    carrying the inverse mapping for free; one row gather fetches the
    slot records; the runs kernel tests everything; one keyed sort
    restores slot order. No alignment, no scatter."""
    n, F = ids.shape
    kp = cm.n_blocks
    P = n * F
    block = cm.block

    if on_tpu:
        assert P % ptile == 0, (P, ptile)
        p2bits = (P - 1).bit_length()
        iota = jnp.arange(P, dtype=jnp.int32)
        if (kp + 1) << p2bits < 2 ** 31:
            keys = (ids.reshape(P) << p2bits) | iota
            keys_s = jax.lax.sort(keys)
            src = keys_s & ((1 << p2bits) - 1)
            blk_s = keys_s >> p2bits
        else:  # key would overflow i32: fall back to a 2-operand sort
            blk_s, src = jax.lax.sort((ids.reshape(P), iota), num_keys=1)
        od = od8[src // F]
        t_s, loc_s = _pair_runs_pallas(blk_s, od, cm.w, block, ptile,
                                       kreal, interpret)
        # back to [n, F] slot order: one keyed sort (src is a
        # permutation of [0, P), so this is exact and dense)
        _, t_p, loc_p = jax.lax.sort((src, t_s, loc_s), num_keys=1)
        t_p = t_p.reshape(n, F)
        loc_p = loc_p.reshape(n, F)
    else:
        t_p, loc_p = _pair_slots_ref(ids, od8, cm.w, block, kreal)

    # Winner select by first-true mask, not argmin + take_along_axis:
    # per-lane gathers over a tiny axis serialize on TPU (the same
    # pathology profiled in intersect_geoms, exp/prof_nomesh.py).
    t_best = jnp.min(t_p, axis=1)
    is_min = t_p == t_best[:, None]
    first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
    blk_best = jnp.sum(jnp.where(first, ids, 0), axis=1)
    loc_best = jnp.sum(jnp.where(first, loc_p, 0), axis=1)
    tri = jnp.where(t_best < BIG, blk_best * block + loc_best, -1)
    return t_best, tri


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def intersect_mesh_pairs(origin, direction, cm: "cl.ClusterMesh", config,
                         t_init=None, active=None,
                         interpret: bool = False,
                         max_passes: int = 3) -> TriHit:
    """Nearest-hit over the cluster mesh; exact (brute-equal) results.

    See module docstring for the three-pass proof structure.
    ``max_passes`` < 3 truncates the proof chain — measurement use only
    (results are then exact only for proven rays).
    """
    n = origin.shape[0]
    tile = config.cluster_tile
    F = config.pair_slots
    ptile = config.pair_tile
    kp = cm.n_blocks
    kreal = cm.n_real_blocks

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

    direction = jnp.where(act[:, None], direction, 0.0)
    actf = act.astype(jnp.float32)
    x = wk._ray16(origin, direction, t0, actf)

    on_tpu = jax.default_backend() == "tpu" or interpret

    # pass 1: top-F pairs
    if on_tpu:
        ids, lbov, cnt = _extract_pallas(x, cm.slab, cm.blk, tile, F,
                                         interpret)
    else:
        ids, lbov, cnt = _extract_ref(x, cm.slab, cm.blk, F)

    od8 = x[:, :8]  # (o, d, t0, actf) slot record

    # Wavefront narrowing: only rays with a nonempty feasible list
    # produce pairs — measured ~35% of a diffuse bounce wavefront on
    # cornell+dragon (exp/bin_stats2.py; dead lanes and analytic-only
    # rays are the rest). Rather than dragging every ray's F sentinel
    # slots through the sort/align/gather/kernel chain, mesh-active
    # rays are compacted into a half-size buffer; a while_loop covers
    # the rare wavefront with more actives than the buffer (primary
    # bounces), costing one extra round at half size. Per-ray results
    # are independent of batch composition, so this is bit-identical
    # to the unnarrowed pass.
    # m1 is ptile-aligned so m1 * F is always divisible by the pair
    # tile, which _pair_pass's reshape(-1, ptile) and the Pallas grid
    # require for every F (F=3 with a merely-64-aligned m1 crashed).
    m1 = max(ptile, -(-npad // 2 // ptile) * ptile)
    bt = t0
    btri = jnp.full((npad,), -1, jnp.int32)
    mesh_act = act & (cnt > 0)

    def n1_cond(state):
        _, _, todo = state
        return jnp.any(todo)

    def n1_body(state):
        bt, btri, todo = state
        nr = jnp.sum(todo.astype(jnp.int32))
        iota = jnp.arange(npad, dtype=jnp.int32)
        _, pos = jax.lax.sort(((~todo).astype(jnp.int32), iota), num_keys=1)
        pos = pos[:m1]
        live = jnp.arange(m1, dtype=jnp.int32) < jnp.minimum(nr, m1)
        ids_c = jnp.where(live[:, None], ids[pos], jnp.int32(kp))
        od8_c = od8[pos] * live.astype(jnp.float32)[:, None]
        t1, tri1 = _pair_pass(ids_c, od8_c, cm, ptile, kreal, on_tpu,
                              interpret)
        bt_pos = bt[pos]
        upd = live & (t1 <= bt_pos)
        bt = bt.at[pos].set(jnp.where(upd, t1, bt_pos))
        btri = btri.at[pos].set(jnp.where(upd, tri1, btri[pos]))
        todo = todo.at[pos].set(jnp.where(live, False, todo[pos]))
        return bt, btri, todo

    bt, btri, _ = jax.lax.while_loop(
        n1_cond, n1_body, (bt, btri, mesh_act)
    )

    # proof: every untested block's entry >= lb_over; a ray whose best
    # t (or analytic bound) is <= lb_over cannot be beaten.
    unproven = act & (lbov < bt) & (cnt > F)

    # pass 2: deeper window (slots F..F2) on the compacted unproven
    # set, LOOPED over a fixed buffer — a single oversized shot either
    # wasted lanes (unproven is usually far below the buffer) or
    # spilled rays into the much slower exhaustive walk when a bounce
    # overflowed it. Rays still unproven after their window accumulate
    # in ``hard`` for pass 3.
    m2 = min(REPAIR_LANES, npad)

    def p2_cond(state):
        _, _, todo2, _ = state
        return jnp.any(todo2)

    def p2_body(state):
        bt, btri, todo2, hard = state
        nr = jnp.sum(todo2.astype(jnp.int32))
        iota = jnp.arange(npad, dtype=jnp.int32)
        _, pos = jax.lax.sort(
            ((~todo2).astype(jnp.int32), iota), num_keys=1
        )
        pos = pos[:m2]
        live = jnp.arange(m2, dtype=jnp.int32) < jnp.minimum(nr, m2)
        livef = live.astype(jnp.float32)
        x2 = x[pos]
        # extraction keeps the ORIGINAL t0 mask so the first F ids
        # reproduce pass 1's exactly (deterministic ties) and slots
        # F..F2 are precisely the untested continuation.
        x2 = x2.at[:, 7].set(x2[:, 7] * livef)
        x2 = x2.at[:, 3:6].mul(livef[:, None])
        if on_tpu:
            ids2, lbov2, cnt2 = _extract_pallas(x2, cm.slab, cm.blk,
                                                min(tile, m2), F2, interpret)
        else:
            ids2, lbov2, cnt2 = _extract_ref(x2, cm.slab, cm.blk, F2)
        ids2 = ids2[:, F:]
        bt2g = jnp.where(live, bt[pos], 0.0)
        od2 = x2[:, :8].at[:, 6].set(bt2g)  # epilogue bound = current best
        t2, tri2 = _pair_pass(ids2, od2, cm, ptile, kreal, on_tpu,
                              interpret)
        upd = live & (t2 < bt2g)
        bt = bt.at[pos].set(jnp.where(upd, t2, bt[pos]))
        btri = btri.at[pos].set(jnp.where(upd, tri2, btri[pos]))
        still = live & (lbov2[:m2] < jnp.where(upd, t2, bt2g)) & (cnt2 > F2)
        hard = hard.at[pos].set(still | hard[pos])
        todo2 = todo2.at[pos].set(jnp.where(live, False, todo2[pos]))
        return bt, btri, todo2, hard

    if max_passes >= 2:
        bt, btri, _, unproven = jax.lax.while_loop(
            p2_cond, p2_body,
            (bt, btri, unproven, jnp.zeros((npad,), bool)),
        )

    # pass 3 (residual tail, ~never): exhaustive walk over a small
    # buffer, LOOPED until every unproven ray has been walked — the
    # walk covers a ray's full feasible list, so each iteration proves
    # its whole buffer and the loop strictly shrinks.
    m3 = min(WALK_LANES, npad)
    tile3 = min(tile, m3)

    def p3_cond(state):
        _, _, unproven = state
        return jnp.any(unproven)

    def p3_body(state):
        bt, btri, unproven = state
        n3 = jnp.sum(unproven.astype(jnp.int32))
        iota = jnp.arange(npad, dtype=jnp.int32)
        _, pos = jax.lax.sort(
            ((~unproven).astype(jnp.int32), iota), num_keys=1
        )
        pos = pos[:m3]
        live = jnp.arange(m3, dtype=jnp.int32) < jnp.minimum(n3, m3)
        livef = live.astype(jnp.float32)
        x3 = x[pos]
        x3 = x3.at[:, 6].set(jnp.where(live, bt[pos], 0.0))
        x3 = x3.at[:, 7].set(x3[:, 7] * livef)
        x3 = x3.at[:, 3:6].mul(livef[:, None])
        if on_tpu:
            te = wk._slab_cull_pallas(x3, cm.slab, cm.blk, tile3, interpret)
        else:
            te = wk._slab_cull_ref(x3, cm.slab, cm.blk, tile3)
        sel, lb, nsel = wk._full_select(te)
        r3 = mxu_bf.ray_features(x3[:, 0:3], x3[:, 3:6]) * livef[:, None]
        r3 = jnp.concatenate([r3, jnp.zeros((m3, 6), jnp.float32)], axis=1)
        t03 = x3[:, 6]
        a3 = x3[:, 7]
        if on_tpu:
            t3, tri3 = wk._walk_pallas(sel, lb, nsel, r3, t03, a3, cm.w,
                                       tile3, cm.block, interpret)
        else:
            t3, tri3 = wk._walk_ref(sel, lb, r3, t03, a3, cm.w, tile3,
                                    cm.block)
        upd = live & (tri3 >= 0)
        bt = bt.at[pos].set(jnp.where(upd, t3, bt[pos]))
        btri = btri.at[pos].set(jnp.where(upd, tri3, btri[pos]))
        unproven = unproven.at[pos].set(jnp.where(live, False, unproven[pos]))
        return bt, btri, unproven

    if max_passes >= 3:
        bt, btri, _ = jax.lax.while_loop(p3_cond, p3_body,
                                         (bt, btri, unproven))

    bt, btri = bt[:n], btri[:n]
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))

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
               bits; one row gather fetches the per-ray MT feature
               records the extraction kernel emitted.
  3. test      (Pallas): one grid cell per 256-pair tile of the sorted
               order; a while_loop walks the tile's contiguous
               same-block RUNS (mean ~1.1/tile), double-buffering each
               run's [16, 4B] Moller-Trumbore weight block from HBM
               behind the MXU round; per-slot nearest (t | loc) packed
               into one i32.
  4. reduce    results return to [N, F] slot order (one keyed 2-operand
               sort) and fold with a per-ray min — deterministic.
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
import os

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from kdtreepathtraceroptimization_tpu.ops import walk as wk
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit
from kdtreepathtraceroptimization_tpu.parallel.ctx import constrain as _sc

# MT-product matmul precision inside the pair kernels. bf16 inputs
# (the TPU default) flip accept/reject decisions on rays that ORIGINATE
# on the tested mesh (secondary bounces: s = o - v0 products near zero,
# 2^-8 relative error crosses the u/v/t >= 0 boundaries), which biases
# glass/low-poly renders visibly vs the exact-f32 VPU intersectors.
# HIGHEST = 3-pass f32: measured nearly free because the kernel is
# output-streaming-bound, not contraction-bound (PERF.md r5 finding 3).
# KDPT_PAIR_BF16=1 restores the truncated mode for A/B measurement.
_PAIR_PRECISION = (None if os.environ.get("KDPT_PAIR_BF16", "0") == "1"
                   else jax.lax.Precision.HIGHEST)

# second-pass window depth and compaction buffer (see module docstring).
# Tuned on the cornell+dragon diffuse wave (exp/pairs_stats.py):
# unproven after pass 1 = 5.9% (38k of 640k) with median feasible count
# 9 and p99 16 — a 12-deep window fully covers 82% of unproven rays and
# proves most of the rest via lb_over, while costing 2.7x fewer slots
# than the previous F2=20/65536 configuration; the exhaustive-walk tail
# picks up the residue either way.
F2 = 12
# Sized so one while_loop round covers the unproven population of a
# dragon-scale diffuse bounce (measured full-call cost ROSE 66->73 ms
# at 49152 — the overflow round costs more than the larger buffer).
REPAIR_LANES = 65536
# pass-3 buffer: the residual tail is a few hundred rays/bounce at
# dragon scale; 2048 lanes measured 0.5 ms cheaper per call than 8192
# with identical results (r5 sweep), and the loop covers overflows.
WALK_LANES = 2048


# ---------------------------------------------------------------------------
# 1. extraction
# ---------------------------------------------------------------------------


# Block-id bits packed into the entry key's low mantissa: 13 bits =
# 8192 blocks = 2.1M triangles at block=256 — covers the reference's
# largest demonstrated scenes (Audi R8 1.69M verts, README.md:170-181;
# Gutenberg 3M+ needs block=512 or the KD walk). The truncation lowers
# entry keys by <= 2^-10 relative, which stays conservative: packing
# only LOWERS an entry, so feasibility ordering can only promote a
# block and lb_over (the min truncated entry over untested blocks)
# stays a true lower bound for the proof (see _extract_math). Scenes
# past the cap skip the cluster build and take the KD walk
# (scene/parser.py imports MAX_CLUSTER_BLOCKS).
_IDX_BITS = 13
MAX_CLUSTER_BLOCKS = 1 << _IDX_BITS


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


def _extract_kernel_t(xt_ref, slabt_ref, blkt_ref, ids_ref, lbov_ref,
                      cnt_ref, featt_ref, *, kp, tl, F):
    """TRANSPOSED extraction: rays on LANES (tl wide), blocks on
    sublanes [kp, tl]. The row-major form was measured 15 ms/bounce in
    selection alone at dragon scale: each of its F+1 elimination
    rounds broadcasts the per-ray min [sub, 1] ACROSS LANES, the slow
    VPU broadcast direction. Here every per-ray quantity is a [1, tl]
    row (cheap sublane replication); the per-block tables are columns
    materialized once. Values are bit-identical to _extract_math (same
    f32 ops, order-insensitive min reductions)."""
    import numpy as _np

    xt = xt_ref[:, :]                                     # [16, tl]
    t0 = xt[6:7, :]
    act = xt[7:8, :] > 0.0
    tmin = jnp.full((kp, tl), -BIG, jnp.float32)
    tmax = jnp.full((kp, tl), BIG, jnp.float32)
    for a in range(3):
        invd = xt[8 + a:9 + a, :]                         # [1, tl]
        oinv = xt[11 + a:12 + a, :]
        lo = slabt_ref[:, a:a + 1]                        # [kp, 1]
        hi = slabt_ref[:, 3 + a:4 + a]
        tlo = lo * invd - oinv
        thi = hi * invd - oinv
        tmin = jnp.maximum(tmin, jnp.minimum(tlo, thi))
        tmax = jnp.minimum(tmax, jnp.maximum(tlo, thi))
    slack = 1e-6 * jnp.abs(tmin) + 1e-5
    tmin = tmin - slack
    tmax = tmax + slack
    entry = jnp.maximum(tmin, 0.0)
    feasible = (
        (tmax >= entry)
        & (tmax > 0.0)
        & (entry < t0)
        & act
        & (blkt_ref[:, 5:6] >= 0.0)  # r2 >= 0: real block
    )
    entry = jnp.where(feasible, entry, BIG)
    cnt_ref[0:1, :] = jnp.sum((entry < BIG).astype(jnp.int32), axis=0,
                              keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, (kp, tl), 0)
    lowmask = jnp.int32((1 << _IDX_BITS) - 1)
    key = (jax.lax.bitcast_convert_type(entry, jnp.int32) & ~lowmask) | rows
    big_key = jnp.int32(
        int(_np.float32(BIG).view(_np.int32)) & ~((1 << _IDX_BITS) - 1)
    )
    dead = jnp.int32(0x7FFFFFFF)
    for f in range(F):
        m = jnp.min(key, axis=0, keepdims=True)           # [1, tl]
        ids_ref[f:f + 1, :] = jnp.where(m < big_key, m & lowmask,
                                        jnp.int32(kp))
        key = jnp.where(key == m, dead, key)
    m = jnp.min(key, axis=0, keepdims=True)
    lbov_ref[0:1, :] = jnp.where(
        m < big_key,
        jax.lax.bitcast_convert_type(m & ~lowmask, jnp.float32),
        jnp.float32(BIG),
    )
    # MT feature rows (_feat16t layout, transposed): assembling these
    # as [n, 16] column writes outside cost 4.8 ms/bounce at dragon
    # scale (16-lane arrays run at 1/8th VPU width); here every row is
    # a full-lane-width op on data already in VMEM.
    actf = xt[7:8, :]
    o = xt[0:3, :]
    d = xt[3:6, :]
    mx = o[1:2] * d[2:3] - o[2:3] * d[1:2]
    my = o[2:3] * d[0:1] - o[0:1] * d[2:3]
    mz = o[0:1] * d[1:2] - o[1:2] * d[0:1]
    featt_ref[0:3, :] = o * actf
    featt_ref[3:6, :] = d * actf
    featt_ref[6:7, :] = mx * actf
    featt_ref[7:8, :] = my * actf
    featt_ref[8:9, :] = mz * actf
    featt_ref[9:10, :] = actf
    featt_ref[10:11, :] = t0
    featt_ref[11:16, :] = jnp.zeros((5, tl), jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "F", "interpret"))
def _extract_pallas(x, slab, blk, tile: int, F: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = x.shape[0]
    kp = blk.shape[1]
    assert kp <= (1 << _IDX_BITS), (
        f"{kp} cluster blocks exceeds the {1 << _IDX_BITS}-block pair "
        "intersector cap (~1M triangles at block=256); the scene "
        "builder should have skipped the cluster table"
    )
    # ray lanes per grid cell, capped so the [kp, tl] entry/key
    # buffers stay within VMEM at large block counts. Mosaic requires
    # the lane dim be a multiple of 128 (or the whole array), so tl
    # floors at 128; the scene builder keeps kp <= 4096 (adaptive
    # block size) so the [kp, 128] buffers stay ~2 MB.
    tl_max = 512
    while tl_max > 128 and kp * tl_max * 4 > 2 ** 21:
        tl_max //= 2
    if n < 128:
        tl = n  # whole-array lane dim (allowed by Mosaic)
        if n % 8:
            raise ValueError(f"ray count {n} not a multiple of 8")
    else:
        for tl in (tl_max, 256, 128):
            if tl <= tl_max and n % tl == 0:
                break
        else:
            raise ValueError(f"ray count {n} not a multiple of 128")
    g = n // tl
    xt = x.T                     # [16, n] — one fused XLA transpose
    slabt = slab.T               # [kp, 8]
    blkt = blk.T
    kernel = functools.partial(_extract_kernel_t, kp=kp, tl=tl, F=F)
    ids, lbov, cnt, featt = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((16, tl), lambda i: (0, i)),
            pl.BlockSpec((kp, 8), lambda i: (0, 0)),
            pl.BlockSpec((kp, 8), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((F, tl), lambda i: (0, i)),
            pl.BlockSpec((1, tl), lambda i: (0, i)),
            pl.BlockSpec((1, tl), lambda i: (0, i)),
            pl.BlockSpec((16, tl), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((16, n), jnp.float32),
        ],
        interpret=interpret,
    ), xt, slabt, blkt)
    return ids.T, lbov.reshape(n), cnt.reshape(n), featt.T


def _extract_ref(x, slab, blk, F):
    """jnp mirror (CPU path / oracle)."""
    kp = blk.shape[1]
    ids, lbov, cnt = _extract_math(x, slab, blk, kp, F)
    return ids, lbov.reshape(-1), cnt.reshape(-1), _feat16t(x[:, :8])


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


def _feat16t(od):
    """_feat16 with the per-pair epilogue bound t0 smuggled into column
    10: the MT weight blocks pad rows 10-15 with zeros (cluster.py
    build), so the matmul is unaffected and the kernel needs no second
    (lane-thin) operand. Computed OUTSIDE the kernel: the cross
    products on an 8-lane-wide [ptile, 8] block inside the kernel ran
    at 1/16th VPU utilization and dominated the per-cell cost."""
    f = _feat16(od)
    return f.at[:, 10].set(od[:, 6])


import numpy as _np_mod
_LOC_BITS = 10         # loc-in-block bits packed into the low mantissa
                       # (block <= 1024: big scenes use 512/1024-tri
                       # blocks to stay under the 8192-block cap)
_PBIG = int(_np_mod.float32(BIG).view(_np_mod.int32)) & ~((1 << _LOC_BITS) - 1)


def _pack_tl(t, loc):
    """(t >= 0 f32, loc < 256 i32) -> ONE i32 whose order equals t's
    (positive floats order as signed ints); the low 8 mantissa bits
    carry loc. Truncation lowers t by <= 2^-13 relative — conservative
    for the lb_over proof (a lowered best can only keep a ray
    unproven), and the final hit t is recomputed exactly from the
    winning triangle downstream (mesh.refine_tri_hit)."""
    m = jnp.int32(~((1 << _LOC_BITS) - 1))
    return (jax.lax.bitcast_convert_type(t, jnp.int32) & m) | loc


def _unpack_tl(p):
    """packed i32 -> (t f32 [exact BIG on miss], loc i32)."""
    m = jnp.int32(~((1 << _LOC_BITS) - 1))
    t = jax.lax.bitcast_convert_type(p & m, jnp.float32)
    t = jnp.where(p >= jnp.int32(_PBIG), jnp.float32(BIG), t)
    return t, p & ((1 << _LOC_BITS) - 1)


def _pair_runs_kernel(tfirst, blk3_ref, blkcol_ref, feat_ref, w1_ref, w_hbm,
                      p_ref, wbuf, sem, *, block, ptile, kreal):
    """Per sorted-pair tile: walk the tile's block RUNS.

    The global block-id sort leaves each tile's pairs grouped into a
    few contiguous same-block runs (mean ~1.1: mean pairs/block far
    exceeds the tile size, so most tiles are one run plus at most one
    boundary split). The FIRST run's [16, 4B] Moller-Trumbore weight
    block arrives through a scalar-prefetched BlockSpec (``w1_ref``,
    indexed by the per-tile first block id), which Pallas pipelines
    across grid cells — the common 1-run tile exposes NO weight-DMA
    latency at all (a manual warm-up DMA inside the cell measured
    ~2.4x the matmul floor). Runs past the first use the ops/walk.py
    manual double-buffer: their DMA is issued before the previous
    run's matmul. Each round is one MXU pass over the WHOLE tile with
    a row-range merge. This replaces the round-3 mono-block layout
    whose per-block alignment needed a scatter+cummax chain over a
    sentinel-padded [P + (K+1)*ptile] slot array — runs work directly
    on the dense sorted order. Sentinel pairs (id >= kreal) sort to
    the global tail; their rows keep the BIG/0 initialization and the
    loop stops at the first sentinel run."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_ref[:, :] = jnp.full((ptile, 1), _PBIG, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ptile, 1), 0)
    blkcol = blkcol_ref[:, :]
    feat = feat_ref[:, :]
    t0col = feat[:, 10:11]  # _feat16t: epilogue bound in the zero-row col

    def dma(slot, b):
        return pltpu.make_async_copy(w_hbm.at[b], wbuf.at[slot], sem.at[slot])

    cols = jax.lax.broadcasted_iota(jnp.int32, (ptile, block), 1)

    def round_(w_mat, r0, b, r1):
        prod = jax.lax.dot_general(
            feat, w_mat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PAIR_PRECISION,
        )
        t = mxu_bf._epilogue(prod, block, t0col)
        # pack loc BEFORE the reduce: one packed min replaces
        # min + argmin (ties resolve to the smaller column, and the
        # CPU oracle reduces identically)
        pmin = jnp.min(_pack_tl(t, cols), axis=1, keepdims=True)
        in_run = (rows >= r0) & (rows < r1)
        p_ref[:, :] = jnp.where(in_run, pmin, p_ref[:, :])

    def runlen(r0, b):
        # sorted order -> the run of block b starting at r0 is
        # contiguous; its length is a single VPU count.
        return r0 + jnp.sum(((blkcol == b) & (rows >= r0)).astype(jnp.int32))

    # ---- run 1 from the pipelined BlockSpec --------------------------
    b0 = blk3_ref[0, 0, 0]
    real0 = b0 < kreal
    r1_0 = jnp.where(real0, runlen(0, b0), ptile)
    b1 = blk3_ref[0, 0, jnp.minimum(r1_0, ptile - 1)]

    # Prefetch run 2 BEFORE run 1's matmul. The predicate equals
    # cond() of the loop's initial state, so every started DMA is
    # waited by exactly one later round — no drain pass is needed.
    @pl.when((r1_0 < ptile) & (b1 < kreal))
    def _():
        dma(0, b1).start()

    @pl.when(real0)
    def _():
        round_(w1_ref[0], 0, b0, r1_0)

    # ---- runs 2+ via manual double-buffer ----------------------------
    def cond(st):
        r0, b, slot = st
        return (r0 < ptile) & (b < kreal)

    def body(st):
        r0, b, slot = st
        r1 = runlen(r0, b)
        b_next = blk3_ref[0, 0, jnp.minimum(r1, ptile - 1)]

        @pl.when((r1 < ptile) & (b_next < kreal))
        def _():
            dma(1 - slot, b_next).start()

        dma(slot, b).wait()
        round_(wbuf[slot], r0, b, r1)
        return r1, b_next, 1 - slot

    jax.lax.while_loop(cond, body, (r1_0, b1, jnp.int32(0)))


_BD_SLOTS = 8  # block-diagonal weight slots (8 x 16 rows = 128 contraction)


def _pair_bdiag_kernel(tfirst, blk3_ref, blkcol_ref, feat_ref, w1_ref, w_hbm,
                       p_ref, wbuf, sem, *, block, ptile, kreal):
    """Block-diagonal supertile: up to 8 runs per MXU round.

    The runs kernel's [ptile, 16] x [16, 4B] rounds are LATENCY-bound:
    8.4 MFLOP at a measured ~1.4 us/round is ~3% of the MXU's bf16
    rate, because a 16-deep contraction can't fill the 128x128 systolic
    array. Here one round covers up to _BD_SLOTS=8 runs at once: each
    pair's 16 features are placed at lane offset 16*slot (slot = its
    run's index within the round) and multiplied against a [128, 4B]
    weight stack holding the 8 runs' MT blocks — each row only meets
    its own block's weights (other slots are zero), so the product is
    IDENTICAL to the per-run rounds (adding exact zeros to an f32
    accumulation chain changes nothing), while the contraction depth
    is 128 and the tile is 4x taller. Multi-round cells (runs > 8,
    rare: mean runs/1024-tile ~ 1.4 on the dragon wave) alternate two
    weight stacks so DMAs never race the previous round's matmul.

    The first run's weight block still arrives through the
    scalar-prefetched BlockSpec (``w1_ref``) pipelined across grid
    cells; runs 2..8 of round 1 and all later rounds DMA on demand."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_ref[:, :] = jnp.full((ptile, 1), _PBIG, jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ptile, 1), 0)
    blkcol = blkcol_ref[:, :]
    feat = feat_ref[:, :]                        # [ptile, 16]
    t0col = feat[:, 10:11]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ptile, block), 1)
    cols128 = jax.lax.broadcasted_iota(jnp.int32, (ptile, 16 * _BD_SLOTS), 1)
    lane_slot = cols128 // 16                     # [ptile, 128]
    feat_tiled = pltpu.repeat(feat, _BD_SLOTS, axis=1)  # [ptile, 128]

    def dma(buf, j, b):
        return pltpu.make_async_copy(
            w_hbm.at[b], wbuf.at[buf, pl.ds(16 * j, 16)], sem.at[buf, j])

    def runlen(r0, b):
        return r0 + jnp.sum(((blkcol == b) & (rows >= r0)).astype(jnp.int32))

    def round_(row0, b0, buf, first: bool):
        """Walk up to 8 runs from (row0, b0); DMA, matmul, merge.
        ``first`` is static: round 1's slot 0 comes from the pipelined
        BlockSpec instead of a DMA. Returns (next_row0, next_b0)."""
        r, b = row0, b0
        starts = []
        waits = []
        for j in range(_BD_SLOTS):
            valid = (r < ptile) & (b < kreal)
            bj = b
            if not (first and j == 0):  # slot 0 of round 1: BlockSpec
                @pl.when(valid)
                def _():
                    dma(buf, j, bj).start()

                waits.append((valid, j, bj))
            starts.append(jnp.where(valid, r, jnp.int32(ptile)))
            r_next = jnp.where(valid, runlen(r, b), r)
            b_next = blk3_ref[0, 0, jnp.minimum(r_next, ptile - 1)]
            r = r_next
            b = jnp.where(valid, b_next, b)

        if first:
            @pl.when(b0 < kreal)
            def _():
                wbuf[buf, 0:16, :] = w1_ref[0]

        in_round = (rows >= row0) & (rows < r)
        slot = jnp.full((ptile, 1), -1, jnp.int32)
        for s_j in starts:
            slot = slot + (rows >= s_j).astype(jnp.int32)
        feat128 = jnp.where((lane_slot == slot) & in_round, feat_tiled, 0.0)

        for valid_j, j, bj in waits:
            @pl.when(valid_j)
            def _():
                dma(buf, j, bj).wait()

        prod = jax.lax.dot_general(
            feat128, wbuf[buf],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PAIR_PRECISION,
        )
        t = mxu_bf._epilogue(prod, block, t0col)
        pmin = jnp.min(_pack_tl(t, cols), axis=1, keepdims=True)
        p_ref[:, :] = jnp.where(in_round, pmin, p_ref[:, :])
        return r, b

    # round 1 (slot 0 pipelined via BlockSpec)
    b0 = blk3_ref[0, 0, 0]
    r1, b1 = round_(jnp.int32(0), b0, 0, True)

    # rounds 2+ (rare): alternate weight stacks
    def cond(st):
        r0, b, buf = st
        return (r0 < ptile) & (b < kreal)

    def body(st):
        r0, b, buf = st
        r_n, b_n = round_(r0, b, buf, False)
        return r_n, b_n, 1 - buf

    jax.lax.while_loop(cond, body, (r1, b1, jnp.int32(1)))


@functools.partial(jax.jit, static_argnames=("block", "ptile", "kreal",
                                             "interpret"))
def _pair_bdiag_pallas(blk_s, feat, w, block: int, ptile: int, kreal: int,
                       interpret: bool):
    """Drop-in twin of _pair_runs_pallas using the block-diagonal
    supertile kernel (bit-identical packed results)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert block <= (1 << _LOC_BITS)
    s = feat.shape[0]
    g = s // ptile
    tfirst = jnp.minimum(blk_s.reshape(g, ptile)[:, 0], kreal - 1)
    kernel = functools.partial(_pair_bdiag_kernel, block=block, ptile=ptile,
                               kreal=kreal)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, ptile), lambda i, tf: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ptile, 1), lambda i, tf: (i, 0)),
            pl.BlockSpec((ptile, 16), lambda i, tf: (i, 0)),
            pl.BlockSpec((1, 16, 4 * block), lambda i, tf: (tf[i], 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ptile, 1), lambda i, tf: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16 * _BD_SLOTS, 4 * block), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _BD_SLOTS)),
        ],
    )
    packed = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, 1), jnp.int32),
        interpret=interpret,
    ), tfirst, blk_s.reshape(g, 1, ptile), blk_s.reshape(s, 1), feat, w, w)
    return packed.reshape(s)


@functools.partial(jax.jit, static_argnames=("block", "ptile", "kreal",
                                             "interpret"))
def _pair_runs_pallas(blk_s, feat, w, block: int, ptile: int, kreal: int,
                      interpret: bool):
    """blk_s [P] i32 (block id per sorted pair, ascending), feat
    [P, 16] (_feat16t records) -> per-pair packed (t | loc) i32 [P]
    (_pack_tl; _PBIG where the pair is sentinel/miss)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert block <= (1 << _LOC_BITS)
    s = feat.shape[0]
    g = s // ptile
    # per-tile first block id (clamped for indexing; realness is
    # re-derived in-kernel from the SMEM copy)
    tfirst = jnp.minimum(blk_s.reshape(g, ptile)[:, 0], kreal - 1)
    kernel = functools.partial(_pair_runs_kernel, block=block, ptile=ptile,
                               kreal=kreal)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tfirst [g]
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, ptile), lambda i, tf: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ptile, 1), lambda i, tf: (i, 0)),
            pl.BlockSpec((ptile, 16), lambda i, tf: (i, 0)),
            pl.BlockSpec((1, 16, 4 * block), lambda i, tf: (tf[i], 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((ptile, 1), lambda i, tf: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, 4 * block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    packed = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, 1), jnp.int32),
        interpret=interpret,
    ), tfirst, blk_s.reshape(g, 1, ptile), blk_s.reshape(s, 1), feat, w, w)
    return packed.reshape(s)


def _pair_slots_ref(ids, feat, w, block, kreal, shards: int = 1):
    """jnp mirror (CPU path / oracle): per-slot nearest (t, loc) in
    [n, F] slot order directly — no sorting, per-slot weight gather.
    Chunked with lax.map so the [chunk, 16, 4B] gathered weights stay
    bounded at any wavefront size; the chunk size divides the
    per-shard row count so no chunk straddles a shard boundary (a
    straddling chunk reshards every lax.map step under GSPMD)."""
    n, F = ids.shape
    S = shards
    m = n // S
    chunk = 1
    while chunk < 4096 and m % (chunk * 2) == 0:
        chunk *= 2

    def one(args):
        ids_c, feat_c = args                              # [S, chunk, .]
        t0 = feat_c[:, :, 10]
        ts, locs = [], []
        cols = jax.lax.broadcasted_iota(jnp.int32, (S, chunk, block), 2)
        for f in range(F):
            blk = ids_c[:, :, f]
            ok = blk < kreal
            wsel = w[jnp.where(ok, blk, 0)]               # [S, chunk, 16, 4B]
            prod = jnp.einsum("scf,scfk->sck", feat_c, wsel)
            t = mxu_bf._epilogue(prod.reshape(-1, 4 * block), block,
                                 t0.reshape(-1)).reshape(S, chunk, block)
            # mirror the TPU kernel's pre-reduce packing exactly so the
            # two paths stay bit-identical (ties -> smaller column)
            tq, lq = _unpack_tl(jnp.min(_pack_tl(t, cols), axis=2))
            ts.append(jnp.where(ok, tq, BIG))
            locs.append(jnp.where(ok, lq, 0))
        return jnp.stack(ts, axis=2), jnp.stack(locs, axis=2)

    # Scan over the CHUNK axis with the shard dim inside each element,
    # so every scan step is shard-local (a chunk axis that interleaves
    # shards makes each lax.map step all-gather its slice).
    ids4 = _sc(ids.reshape(S, m // chunk, chunk, F)).transpose(1, 0, 2, 3)
    ft4 = _sc(feat.reshape(S, m // chunk, chunk, 16)).transpose(1, 0, 2, 3)
    t, loc = jax.lax.map(one, (ids4, ft4))                # [mc, S, chunk, F]
    t = _sc(t.transpose(1, 0, 2, 3)).reshape(n, F)
    loc = _sc(loc.transpose(1, 0, 2, 3)).reshape(n, F)
    return t, loc


def _pair_pass(ids, feat, cm, ptile, kreal, on_tpu, interpret, shards=1,
               bdiag=False):
    """Test every (ray, block) pair in ``ids`` [n, F]; return per-ray
    (t_best [n], tri_best [n]) over those pairs (BIG/-1 where none).

    ids == kp marks empty slots. feat [n, 16] per-ray _feat16t record
    (MT features; col 10 = epilogue bound t0).

    TPU path: ONE 1-operand packed-key sort (block id in the high
    bits, pair index in a pow2 low field) groups pairs by block while
    carrying the inverse mapping for free; one row gather fetches the
    slot records; the runs kernel tests everything; one keyed sort
    restores slot order. No alignment, no scatter.

    ``shards`` > 1 makes every sort/gather SHARD-LOCAL: the ray axis is
    viewed as [shards, n/shards] and sorts run along dimension 1, so a
    ray-sharded GSPMD program (parallel/sharding.py) emits no
    cross-chip all-to-all — each chip groups its own pairs. Per-pair
    results are independent of grouping, so shard-local is
    bit-identical to global."""
    n, F = ids.shape
    kp = cm.n_blocks
    block = cm.block
    S = shards
    m = n // S
    Ps = m * F
    Pp = -(-Ps // ptile) * ptile  # pad per-shard pairs to the grid tile

    if on_tpu:
        p2bits = (Pp - 1).bit_length()
        ids2 = ids.reshape(S, Ps)
        if Pp != Ps:
            ids2 = jnp.concatenate(
                [ids2, jnp.full((S, Pp - Ps), kp, jnp.int32)], axis=1)
        overflow = (kp + 1) << p2bits >= 2 ** 31
        if S == 1 and not overflow:
            # flat fast path (dimension-1 sorts on [1, N] lower slower)
            iota1 = jnp.arange(Pp, dtype=jnp.int32)
            keys_s = jax.lax.sort((ids2.reshape(Pp) << p2bits) | iota1)
            src = keys_s & ((1 << p2bits) - 1)
            blk_s = keys_s >> p2bits
            ray = jnp.minimum(src // F, m - 1)
            featp = feat[ray]
            runner = _pair_bdiag_pallas if bdiag else _pair_runs_pallas
            packed = runner(blk_s, featp, cm.w, block, ptile, kreal,
                            interpret)
            _, p_p = jax.lax.sort((src, packed), num_keys=1)
            t_p, loc_p = _unpack_tl(p_p[:Ps].reshape(n, F))
        else:
            ids2 = _sc(ids2)
            iota = jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (S, Pp), 1), (S, Pp))
            if not overflow:
                keys_s = _sc(jax.lax.sort((ids2 << p2bits) | iota,
                                          dimension=1))
                src = keys_s & ((1 << p2bits) - 1)
                blk_s = keys_s >> p2bits
            else:  # key would overflow i32: 2-operand sort
                blk_s, src = jax.lax.sort((ids2, iota), num_keys=1,
                                          dimension=1)
                blk_s, src = _sc(blk_s), _sc(src)
            ray = jnp.minimum(src // F, m - 1)  # pad slots: sentinel
            featp = _take_rows(feat.reshape(S, m, 16), ray)  # [S, Pp, 16]
            runner = _pair_bdiag_pallas if bdiag else _pair_runs_pallas
            packed = runner(
                blk_s.reshape(S * Pp), featp.reshape(S * Pp, 16), cm.w,
                block, ptile, kreal, interpret)
            # back to [n, F] slot order: one keyed 2-operand sort (src
            # is a row-local permutation of [0, Pp), pad tail last; the
            # packed (t | loc) result is ONE operand)
            _, p_p = jax.lax.sort(
                (src, _sc(packed.reshape(S, Pp))), num_keys=1, dimension=1)
            t_p, loc_p = _unpack_tl(_sc(p_p)[:, :Ps].reshape(n, F))
    else:
        t_p, loc_p = _pair_slots_ref(ids, feat, cm.w, block, kreal,
                                     shards=S)

    # Winner select channel-split over the F slot columns (F is tiny
    # and static): [n, F] tiles broadcast against [n, 1] masks run at a
    # fraction of VPU width (the same pathology measured in the nomesh
    # chain, exp/nomesh_stages.py — this reduce alone was 5.5 ms/call
    # at dragon scale as [n, F] ops, ~1 ms as F unrolled [n] chains).
    # First-true tie-break identical to the previous cumsum form.
    tcols = [t_p[:, f] for f in range(F)]
    icols = [ids[:, f] for f in range(F)]
    lcols = [loc_p[:, f] for f in range(F)]
    t_best = tcols[0]
    for f in range(1, F):
        t_best = jnp.minimum(t_best, tcols[f])
    taken = jnp.zeros_like(t_best, dtype=bool)
    blk_best = jnp.zeros_like(icols[0])
    loc_best = jnp.zeros_like(lcols[0])
    for f in range(F):
        is_f = (tcols[f] == t_best) & ~taken
        blk_best = jnp.where(is_f, icols[f], blk_best)
        loc_best = jnp.where(is_f, lcols[f], loc_best)
        taken = taken | is_f
    tri = jnp.where(t_best < BIG, blk_best * block + loc_best, -1)
    return t_best, tri


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _scatter_back(pos_full, updates, olds):
    """Write compacted updates back to their source columns WITHOUT a
    scatter: values for the untouched tail are gathered, and one
    multi-operand rank-restore sort (keys = pos_full) lands every
    column at its original position. XLA's SPMD partitioner handles
    dimension-1 sorts and batched gathers shard-locally but
    all-gathers scatters (measured on the compiled sharded module), so
    this is both the fast and the collective-free form.

    updates: list of [S, mbuf] values for columns pos_full[:, :mbuf];
    olds: matching list of [S, ns] arrays. Returns the updated arrays.

    Single shard: a plain flat scatter — on one chip the scatter is
    ~3x cheaper than the rank-restore sort + tail gathers (measured at
    dragon scale), and there is no partitioner to appease.
    """
    mbuf = updates[0].shape[1]
    if pos_full.shape[0] == 1:
        pos = pos_full[0, :mbuf]
        return tuple(
            old.reshape(-1).at[pos].set(upd[0]).reshape(old.shape)
            for old, upd in zip(olds, updates)
        )
    vals = []
    casts = []
    for old, upd in zip(olds, updates):
        cast = old.dtype == jnp.bool_
        casts.append(cast)
        tail = _take_rows(old, pos_full[:, mbuf:])
        v = jnp.concatenate([upd, tail], axis=1)
        vals.append(v.astype(jnp.int32) if cast else v)
    out = jax.lax.sort((pos_full, *vals), num_keys=1, dimension=1)
    return tuple(
        _sc(o.astype(jnp.bool_) if cast else o)
        for o, cast in zip(out[1:], casts)
    )


def _take_rows(a, pos):
    """Row-local gather a[s, pos[s]]. Single shard: a plain flat row
    gather (the fastest TPU form). Sharded: take_along_axis — the
    batched gather partitions shard-locally under GSPMD where the
    advanced-index form a[rows, pos] all-gathers the operand
    (measured in the compiled sharded module)."""
    if pos.shape[0] == 1:
        return a[0][pos[0]][None]
    idx = pos.reshape(pos.shape + (1,) * (a.ndim - 2))
    return _sc(jnp.take_along_axis(_sc(a), idx, axis=1))


def _compact_all(todo):
    """Flagged-first column permutation of the whole [S, ns] view plus
    the per-shard flagged count. The flagged set of each proof pass is
    STATIC once computed, so the pass loops slice THIS one permutation
    round by round instead of re-sorting and maintaining a todo mask
    every iteration (which cost a full-width sort + mask scatter per
    round)."""
    S, ns = todo.shape
    iota = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (S, ns), 1), (S, ns))
    bits = (ns - 1).bit_length()
    assert 1 << (bits + 1) < 2 ** 31, ns
    key = ((~todo).astype(jnp.int32) << bits) | iota
    if S == 1:  # flat 1-D sorts lower faster than [1, ns] dimension-1
        pos = (jax.lax.sort(key.reshape(ns))
               & ((1 << bits) - 1)).reshape(1, ns)
    else:
        pos = jax.lax.sort(key, dimension=1) & ((1 << bits) - 1)
    nr = jnp.sum(todo.astype(jnp.int32), axis=1)
    return _sc(pos), nr


def _pad_positions(pos, total):
    """Pad the position permutation to ``total`` columns with UNIQUE
    out-of-range sentinels (ns, ns+1, ...): slices then never clamp,
    sentinel slots sort past the real columns in the rank-restore, and
    the flat scatter drops them."""
    S, ns = pos.shape
    if total == ns:
        return pos
    extra = jnp.broadcast_to(
        jnp.arange(ns, total, dtype=jnp.int32)[None, :], (S, total - ns))
    return jnp.concatenate([pos, extra], axis=1)


def _scatter_slice(pos_pad, k, mbuf, updates, olds):
    """Write per-round updates for columns pos_pad[:, k*mbuf:(k+1)*mbuf]
    back into the olds. Single shard: one flat scatter with
    out-of-range (sentinel) positions dropped. Sharded: gather the
    olds at the padded permutation, overlay the round's slice with
    dynamic_update_slice, and ONE multi-operand rank-restore sort —
    the collective-free form (scatters all-gather under GSPMD)."""
    S = pos_pad.shape[0]
    pos = jax.lax.dynamic_slice(pos_pad, (jnp.int32(0), k * mbuf),
                                (S, mbuf))
    if S == 1:
        return tuple(
            old.reshape(-1).at[pos[0]].set(upd[0], mode="drop")
            .reshape(old.shape)
            for old, upd in zip(olds, updates)
        )
    ns = olds[0].shape[1]
    safe = jnp.clip(pos_pad, 0, ns - 1)
    fulls = []
    casts = []
    for old, upd in zip(olds, updates):
        cast = old.dtype == jnp.bool_
        casts.append(cast)
        oldp = jnp.take_along_axis(_sc(old), safe, axis=1)
        full = jax.lax.dynamic_update_slice(
            oldp, upd, (jnp.int32(0), k * mbuf))
        fulls.append(full.astype(jnp.int32) if cast else full)
    out = jax.lax.sort((pos_pad, *fulls), num_keys=1, dimension=1)
    return tuple(
        _sc((o[:, :ns]).astype(jnp.bool_) if cast else o[:, :ns])
        for o, cast in zip(out[1:], casts)
    )


def intersect_mesh_pairs(origin, direction, cm: "cl.ClusterMesh", config,
                         t_init=None, active=None,
                         interpret: bool = False,
                         max_passes: int = 3,
                         collect_stats: bool = False):
    """Nearest-hit over the cluster mesh; exact (brute-equal) results.

    See module docstring for the three-pass proof structure.
    ``max_passes`` < 3 truncates the proof chain — measurement use only
    (results are then exact only for proven rays).

    With ``config.binned_shards`` = S > 1 every data-movement stage
    (narrowing compaction, pair grouping, result un-sort, repair
    compaction) is row-local on a [S, n/S] view of the ray axis, so a
    ray-sharded GSPMD program emits no cross-chip all-to-all or
    all-gather in the forward intersector (the while_loop stop tests
    are scalar all-reduces). Results are bit-identical to S=1.
    """
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    n = origin.shape[0]
    tile = config.cluster_tile
    F = config.pair_slots
    bdiag = bool(getattr(config, "pair_bdiag", False))
    ptile = (int(getattr(config, "pair_bdiag_tile", 1024)) if bdiag
             else config.pair_tile)
    kp = cm.n_blocks
    kreal = cm.n_real_blocks

    origin = jnp.asarray(origin, jnp.float32) - cm.center_shift
    direction = jnp.asarray(direction, jnp.float32)
    t0 = jnp.full((n,), BIG, jnp.float32) if t_init is None else t_init
    act = jnp.ones((n,), bool) if active is None else active

    S = max(1, int(getattr(config, "binned_shards", 1)))
    quant = tile * S
    pad = (-n) % quant
    if pad:
        origin = jnp.concatenate([origin, jnp.zeros((pad, 3), jnp.float32)])
        direction = jnp.concatenate([direction, jnp.zeros((pad, 3), jnp.float32)])
        t0 = jnp.concatenate([t0, jnp.zeros((pad,), jnp.float32)])
        act = jnp.concatenate([act, jnp.zeros((pad,), bool)])
    npad = origin.shape[0]
    ns = npad // S

    direction = jnp.where(act[:, None], direction, 0.0)
    actf = act.astype(jnp.float32)
    x = wk._ray16(origin, direction, t0, actf)

    on_tpu = jax.default_backend() == "tpu" or interpret

    # pass 1: top-F pairs (+ the per-ray MT feature record)
    if on_tpu:
        ids, lbov, cnt, feat = _extract_pallas(x, cm.slab, cm.blk, tile, F,
                                               interpret)
    else:
        ids, lbov, cnt, feat = _extract_ref(x, cm.slab, cm.blk, F)

    featv = _sc(feat.reshape(S, ns, 16))
    idsv = _sc(ids.reshape(S, ns, F))

    # Wavefront narrowing: only rays with a nonempty feasible list
    # produce pairs — measured ~35% of a diffuse bounce wavefront on
    # cornell+dragon (exp/bin_stats2.py; dead lanes and analytic-only
    # rays are the rest). Rather than dragging every ray's F sentinel
    # slots through the sort/gather/kernel chain, mesh-active rays are
    # compacted into a half-size PER-SHARD buffer; a while_loop covers
    # the rare wavefront with more actives than the buffer (primary
    # bounces), costing one extra round at half size. Per-ray results
    # are independent of batch composition, so this is bit-identical
    # to the unnarrowed pass. (m1 is ptile-aligned where possible;
    # _pair_pass pads its per-shard pair axis to the grid tile anyway,
    # so any m1 <= ns is safe.)
    ndiv = max(1, int(getattr(config, "pair_narrow_div", 2)))
    m1 = min(ns, max(ptile, -(-ns // ndiv // ptile) * ptile))
    bt = _sc(t0.reshape(S, ns))
    btri = _sc(jnp.full((S, ns), -1, jnp.int32))
    mesh_act = _sc((act & (cnt > 0)).reshape(S, ns))

    pos1, nr1 = _compact_all(mesh_act)      # the set is static: ONE sort
    pos1p = _pad_positions(pos1, -(-ns // m1) * m1)
    iota_m1 = jnp.arange(m1, dtype=jnp.int32)[None, :]

    def n1_cond(state):
        k, _, _ = state
        return k * m1 < jnp.max(nr1)

    def n1_body(state):
        k, bt, btri = state
        pos = jax.lax.dynamic_slice(pos1p, (jnp.int32(0), k * m1), (S, m1))
        live = (k * m1 + iota_m1) < nr1[:, None]
        ids_c = jnp.where(live[:, :, None], _take_rows(idsv, pos),
                          jnp.int32(kp))
        ft_c = _take_rows(featv, pos) * live.astype(jnp.float32)[:, :, None]
        t1, tri1 = _pair_pass(ids_c.reshape(S * m1, F),
                              ft_c.reshape(S * m1, 16),
                              cm, ptile, kreal, on_tpu, interpret, shards=S,
                              bdiag=bdiag)
        t1 = t1.reshape(S, m1)
        tri1 = tri1.reshape(S, m1)
        bt_pos = _take_rows(bt, pos)
        upd = live & (t1 <= bt_pos)
        bt, btri = _scatter_slice(
            pos1p, k, m1,
            [jnp.where(upd, t1, bt_pos),
             jnp.where(upd, tri1, _take_rows(btri, pos))],
            [bt, btri])
        return k + 1, bt, btri

    k1, bt, btri = jax.lax.while_loop(
        n1_cond, n1_body, (jnp.int32(0), bt, btri)
    )

    # proof: every untested block's entry >= lb_over; a ray whose best
    # t (or analytic bound) is <= lb_over cannot be beaten.
    lbovv = _sc(lbov.reshape(S, ns))
    cntv = _sc(cnt.reshape(S, ns))
    unproven = _sc(act.reshape(S, ns) & (lbovv < bt) & (cntv > F))

    # pass 2: deeper window (slots F..F2) on the compacted unproven
    # set, LOOPED over a fixed per-shard buffer — a single oversized
    # shot either wasted lanes (unproven is usually far below the
    # buffer) or spilled rays into the much slower exhaustive walk when
    # a bounce overflowed it. Rays still unproven after their window
    # accumulate in ``hard`` for pass 3.
    # the repair buffers are GLOBAL budgets: each shard carries its
    # 1/S share, else per-device work stops shrinking with the device
    # count (measured: work_efficiency 0.24 at 8 shards with unscaled
    # caps — the capped pass-2/3 stages became per-device constants)
    m2 = min(max(ptile, REPAIR_LANES // S), ns)
    xv = _sc(x.reshape(S, ns, 16))

    pos2, nr2 = _compact_all(unproven)      # static set: ONE sort
    pos2p = _pad_positions(pos2, -(-ns // m2) * m2)
    iota_m2 = jnp.arange(m2, dtype=jnp.int32)[None, :]

    def p2_cond(state):
        k, _, _, _ = state
        return k * m2 < jnp.max(nr2)

    def p2_body(state):
        k, bt, btri, hard = state
        pos = jax.lax.dynamic_slice(pos2p, (jnp.int32(0), k * m2), (S, m2))
        live = (k * m2 + iota_m2) < nr2[:, None]
        livef = live.astype(jnp.float32)
        x2 = _take_rows(xv, pos)                           # [S, m2, 16]
        # extraction keeps the ORIGINAL t0 mask so the first F ids
        # reproduce pass 1's exactly (deterministic ties) and slots
        # F..F2 are precisely the untested continuation.
        x2 = x2.at[:, :, 7].set(x2[:, :, 7] * livef)
        x2 = x2.at[:, :, 3:6].mul(livef[:, :, None])
        x2f = x2.reshape(S * m2, 16)
        if on_tpu:
            ids2, lbov2, cnt2, ft2 = _extract_pallas(
                x2f, cm.slab, cm.blk, min(tile, m2), F2, interpret)
        else:
            ids2, lbov2, cnt2, ft2 = _extract_ref(x2f, cm.slab, cm.blk, F2)
        ids2 = ids2[:, F:]
        bt2g = jnp.where(live, _take_rows(bt, pos), 0.0)
        # window epilogue bound = the current best (col 10, see _feat16t)
        ft2 = ft2.at[:, 10].set(bt2g.reshape(S * m2))
        t2, tri2 = _pair_pass(ids2, ft2, cm, ptile, kreal, on_tpu,
                              interpret, shards=S, bdiag=bdiag)
        t2 = t2.reshape(S, m2)
        tri2 = tri2.reshape(S, m2)
        upd = live & (t2 < bt2g)
        still = (live & (lbov2.reshape(S, m2) < jnp.where(upd, t2, bt2g))
                 & (cnt2.reshape(S, m2) > F2))
        bt, btri, hard = _scatter_slice(
            pos2p, k, m2,
            [jnp.where(upd, t2, _take_rows(bt, pos)),
             jnp.where(upd, tri2, _take_rows(btri, pos)),
             still | _take_rows(hard, pos)],
            [bt, btri, hard])
        return k + 1, bt, btri, hard

    k2 = jnp.int32(0)
    if max_passes >= 2:
        k2, bt, btri, unproven = jax.lax.while_loop(
            p2_cond, p2_body,
            (jnp.int32(0), bt, btri, jnp.zeros((S, ns), bool)),
        )

    # pass 3 (residual tail, ~never): exhaustive walk over a small
    # per-shard buffer, LOOPED until every unproven ray has been
    # walked — the walk covers a ray's full feasible list, so each
    # iteration proves its whole buffer and the loop strictly shrinks.
    m3 = min(max(256, WALK_LANES // S), ns)
    tile3 = min(tile, m3, wk.vmem_tile_cap(kp))

    iota_m3 = jnp.arange(m3, dtype=jnp.int32)[None, :]

    def _run_pass3(bt, btri):
        pos3, nr3 = _compact_all(unproven)  # static set: ONE sort
        pos3p = _pad_positions(pos3, -(-ns // m3) * m3)

        def p3_cond(state):
            k, _, _ = state
            return k * m3 < jnp.max(nr3)

        def p3_body(state):
            k, bt, btri = state
            pos = jax.lax.dynamic_slice(pos3p, (jnp.int32(0), k * m3),
                                        (S, m3))
            live = (k * m3 + iota_m3) < nr3[:, None]
            livef = live.astype(jnp.float32)
            x3 = _take_rows(xv, pos)
            x3 = x3.at[:, :, 6].set(jnp.where(live, _take_rows(bt, pos), 0.0))
            x3 = x3.at[:, :, 7].set(x3[:, :, 7] * livef)
            x3 = x3.at[:, :, 3:6].mul(livef[:, :, None])
            x3f = x3.reshape(S * m3, 16)
            if on_tpu:
                te = wk._slab_cull_pallas(x3f, cm.slab, cm.blk, tile3,
                                          interpret)
            else:
                te = wk._slab_cull_ref(x3f, cm.slab, cm.blk, tile3)
            sel, lb, nsel = wk._full_select(te)
            r3 = mxu_bf.ray_features(x3f[:, 0:3], x3f[:, 3:6])
            r3 = r3 * livef.reshape(S * m3)[:, None]
            r3 = jnp.concatenate([r3, jnp.zeros((S * m3, 6), jnp.float32)],
                                 axis=1)
            t03 = x3f[:, 6]
            a3 = x3f[:, 7]
            if on_tpu:
                t3, tri3 = wk._walk_pallas(sel, lb, nsel, r3, t03, a3, cm.w,
                                           tile3, cm.block, interpret)
            else:
                t3, tri3 = wk._walk_ref(sel, lb, r3, t03, a3, cm.w, tile3,
                                        cm.block)
            t3 = t3.reshape(S, m3)
            tri3 = tri3.reshape(S, m3)
            upd = live & (tri3 >= 0)
            bt, btri = _scatter_slice(
                pos3p, k, m3,
                [jnp.where(upd, t3, _take_rows(bt, pos)),
                 jnp.where(upd, tri3, _take_rows(btri, pos))],
                [bt, btri])
            return k + 1, bt, btri

        k3, bt, btri = jax.lax.while_loop(
            p3_cond, p3_body, (jnp.int32(0), bt, btri))
        return bt, btri, k3

    if max_passes >= 3:
        # The residual tail is empty on most waves (pass 2 proves
        # everything); lax.cond skips the compaction SORT (the
        # dominant pass-3 cost, ~4 ms at 640k) when nothing is left.
        bt, btri, k3 = jax.lax.cond(
            jnp.any(unproven),
            lambda a: _run_pass3(*a),
            lambda a: (a[0], a[1], jnp.int32(0)),
            (bt, btri),
        )
    else:
        k3 = jnp.int32(0)

    bt, btri = bt.reshape(npad)[:n], btri.reshape(npad)[:n]
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    hit = jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))
    if collect_stats:
        # EXECUTED-work counters (VERDICT r4 item 6): per-device work of
        # each lockstep pass = rounds x fixed per-shard stage size.
        # Loop trip counts are real executed rounds (data-dependent),
        # not compiled-FLOP estimates.
        stats = {
            "n1_rounds": k1, "p2_rounds": k2, "p3_rounds": k3,
            "m1": jnp.int32(m1), "m2": jnp.int32(m2), "m3": jnp.int32(m3),
            "pair_slots": jnp.int32(F),
            "per_device_pair_rows": k1 * m1 * F + k2 * m2 * (F2 - F)
                                    + k3 * m3,
            "shards": jnp.int32(S),
        }
        return hit, stats
    return hit

"""Exact entry-ordered block walk: the round-3 production intersector.

Measured design drivers (exp/bin_stats2.py, cornell+dragon 800x800
diffuse wavefront, 391 Morton blocks of 256 tris):

* sphere bounds admit 14.5 feasible blocks/ray (mean) — AABB slab
  bounds admit ~2.5x fewer. The cull here therefore tests the block's
  box, not its circumsphere, still as one matmul (+ VPU min/max).
* under ANY tested wavefront ordering, per-tile feasible unions exceed
  a fixed round budget for most tiles, so a budget-plus-repair design
  (ops/cluster.py, ops/binned.py) degenerates into its repair path.
  Here every tile instead walks its FULL entry-ordered feasible list
  inside one kernel — a lax.while_loop with a real early exit (stop
  when no live ray can improve past the next entry bound) and manual
  double-buffered HBM->VMEM DMA of the triangle weight blocks. No
  budget, no flags, no repair: exact (brute-equal) by construction.

Pipeline per call:

  1. coherence sort (shard-local, ops/binned helpers): direction
     octant + origin morton (the measured best ordering); dead and
     mesh-missing rays sort to the back where tiles exit immediately.
  2. slab cull (Pallas): [tiles, K] tile-min conservative AABB entry
     bounds; one [tile,16]x[16,6K] matmul per tile, [sub,K]
     intermediates in VMEM only.
  3. full select: per-tile entry-ordered feasible block list (one
     argsort of [G, K]) + count.
  4. walk kernel (Pallas): per tile, while_loop over its list; each
     round DMAs the selected [16, 4B] Moller-Trumbore weight block
     (prefetching the next behind the matmul) and folds an MXU
     intersection round into the per-ray running min.
  5. un-sort results.

The traversal contract being replaced: traverseKDbareShortHybrid,
/root/reference/src/pathtrace.cu:1023-1235 (per-thread short-stack KD
walk; entry-ordered near-first culling plays the role of its
near-subtree-first stack discipline, and the while_loop early exit the
role of its t-bounded pop-skip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from kdtreepathtraceroptimization_tpu.ops.binned import _apply_perm, _bin_rank
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit


def _ray16(o, d, t0, act):
    """[n, 16] cull features: o d t0 act invd o*invd 0 0.

    invd is sign-preserving and clamped to 1e7 (axis-parallel rays):
    the slab test then under-reports only entries that are already far
    beyond any scene t, and the slack pad below absorbs the rounding.
    """
    s = jnp.where(d >= 0.0, 1.0, -1.0)
    invd = s / jnp.maximum(jnp.abs(d), 1e-7)
    z = jnp.zeros((o.shape[0], 2), jnp.float32)
    return jnp.concatenate(
        [o, d, t0[:, None], act[:, None], invd, o * invd, z], axis=1
    )


def _slab_entry_math(x, slab, blk, kp):
    """[sub, 16] features + [8, K] slab table (rows lo_xyz hi_xyz) ->
    entry [sub, K].

    entry = conservative ray parameter at which the ray can first be
    inside block k's AABB; BIG where infeasible. tlo/thi are computed
    as VPU broadcast multiplies (lo_a[k] * invd_a - o_a * invd_a): the
    round-2 form routed the SAME products through a [16, 6K] matmul
    whose 16-wide contraction capped the MXU at 12.5% utilization and
    made the cull the single most expensive extraction stage (12.5 ms
    at dragon scale); the broadcast form is ~30x less arithmetic. The
    slack pad keeps the bound conservative under the (lo*invd - o*invd)
    cancellation (see _ray16)."""
    t0 = x[:, 6:7]
    act = x[:, 7:8] > 0.0
    tmin = jnp.full((x.shape[0], kp), -BIG, jnp.float32)
    tmax = jnp.full((x.shape[0], kp), BIG, jnp.float32)
    for a in range(3):
        invd = x[:, 8 + a:9 + a]
        oinv = x[:, 11 + a:12 + a]
        tlo = slab[a:a + 1, :] * invd - oinv
        thi = slab[3 + a:4 + a, :] * invd - oinv
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
        & (blk[5:6, :] >= 0.0)  # r2 >= 0: real (non-sentinel) block
    )
    return jnp.where(feasible, entry, BIG)


def _slab_cull_kernel(x_ref, slab_ref, blk_ref, out_ref, *, kp, tile):
    """Per ray tile: tile-min AABB entry bound into every block, in 8
    subtile rows ([sub, K] intermediates live in VMEM only)."""
    sub = tile // 8
    for m in range(8):
        x = x_ref[m * sub:(m + 1) * sub, :]
        entry = _slab_entry_math(x, slab_ref[:, :], blk_ref, kp)
        out_ref[m:m + 1, :] = jnp.min(entry, axis=0, keepdims=True)


def vmem_tile_cap(kp: int, budget_bytes: int = 1 << 21) -> int:
    """Largest pow-2 ray tile whose [tile, kp] f32 entry table stays
    under ``budget_bytes`` — big-block-count scenes (adaptive 512/1024
    blocks past 1M tris) must shrink the cull tile or the kernel's
    VMEM stack overflows (measured at 8192 blocks)."""
    t = 8
    while t * 2 * kp * 4 <= budget_bytes:
        t *= 2
    return t


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _slab_cull_pallas(x, slab, blk, tile: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = x.shape[0]
    kp = blk.shape[1]
    g = n // tile
    kernel = functools.partial(_slab_cull_kernel, kp=kp, tile=tile)
    out = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile, 16), lambda i: (i, 0)),
            pl.BlockSpec((8, kp), lambda i: (0, 0)),
            pl.BlockSpec((8, kp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, kp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((8 * g, kp), jnp.float32),
        interpret=interpret,
    ), x, slab, blk)
    return out.reshape(g, 8, kp).min(axis=1)


def _slab_cull_ref(x, slab, blk, tile: int):
    """jnp mirror of the slab cull (CPU path / oracle)."""
    n = x.shape[0]
    kp = blk.shape[1]
    entry = _slab_entry_math(x, slab, blk, kp)
    return entry.reshape(n // tile, tile, kp).min(axis=1)


def _full_select(tile_entry):
    """Entry-ordered FULL per-tile block lists.

    -> sel [G, K] i32 (entry order; infeasible tail repeats the last
    feasible id so back-to-back DMAs dedupe), lb [G, K] f32 (+inf on
    the tail), nsel [G, 1] i32 feasible count."""
    g, kp = tile_entry.shape
    order = jnp.argsort(tile_entry, axis=1)
    sorted_e = jnp.take_along_axis(tile_entry, order, axis=1)
    count = jnp.sum(sorted_e < BIG, axis=1).astype(jnp.int32)
    sel = order.astype(jnp.int32)
    jj = jnp.arange(kp, dtype=jnp.int32)[None, :]
    last = jnp.clip(count - 1, 0, kp - 1)[:, None]
    last_sel = jnp.take_along_axis(sel, last, axis=1)
    live = jj < count[:, None]
    sel = jnp.where(live, sel, last_sel)
    lb = jnp.where(live, sorted_e, BIG)
    return sel, lb, count.reshape(g, 1)


# ---------------------------------------------------------------------------
# the walk kernel
# ---------------------------------------------------------------------------


def _walk_kernel(sel_ref, lb_ref, ns_ref, r_ref, t0_ref, act_ref, w_hbm,
                 bt_ref, btri_ref, wbuf, sem, *, block, tile, kp):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bt_ref[:, :] = t0_ref[:, :]
    btri_ref[:, :] = jnp.full((tile, 1), -1, jnp.int32)
    act = act_ref[:, :] > 0.0

    nr = ns_ref[0, 0, 0]

    def dma(slot, rr):
        return pltpu.make_async_copy(
            w_hbm.at[sel_ref[0, 0, rr]], wbuf.at[slot], sem.at[slot]
        )

    live0 = (nr > 0) & jnp.any(act & (t0_ref[:, :] > lb_ref[0, 0, 0]))

    @pl.when(live0)
    def _():
        dma(0, 0).start()

    def cond(state):
        rr, live = state
        return live

    def body(state):
        rr, _ = state
        dma(rr % 2, rr).wait()
        nxt = rr + 1

        @pl.when(nxt < nr)
        def _():
            dma(nxt % 2, nxt).start()

        prod = jax.lax.dot_general(
            r_ref[:, :], wbuf[rr % 2],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile, 4B]
        bt = bt_ref[:, :]
        t = mxu_bf._epilogue(prod, block, bt)
        loc = jnp.argmin(t, axis=1, keepdims=True).astype(jnp.int32)
        lt = jnp.min(t, axis=1, keepdims=True)
        better = lt < bt
        bt_new = jnp.where(better, lt, bt)
        bt_ref[:, :] = bt_new
        btri_ref[:, :] = jnp.where(
            better, sel_ref[0, 0, rr] * block + loc, btri_ref[:, :]
        )
        # Early exit: entry-ordered lists mean no later block can beat
        # a ray already at or below the next entry bound; the tile
        # stops when that holds for every live ray. lb is +inf past
        # nsel, so rr == nr also terminates here.
        # (nxt can reach kp on the last round; clamp the read — the
        # nxt < nr term already kills `live` there.)
        nxt_lb = lb_ref[0, 0, jnp.minimum(nxt, kp - 1)]
        live = (nxt < nr) & jnp.any(act & (bt_new > nxt_lb))
        return nxt, live

    rr_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), live0))

    # Drain: an early exit leaves the speculative prefetch for rr_end
    # in flight (and live0=False leaves the warm-up DMA for round 0) —
    # wait it out so the semaphore is clean for the next grid cell.
    @pl.when(((rr_end > 0) & (rr_end < nr)) | ((rr_end == 0) & live0))
    def _():
        dma(rr_end % 2, rr_end).wait()


@functools.partial(jax.jit, static_argnames=("tile", "block", "interpret"))
def _walk_pallas(sel, lb, nsel, r, t0, act, w, tile: int, block: int,
                 interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = r.shape[0]
    g = n // tile
    kp = sel.shape[1]
    kernel = functools.partial(_walk_kernel, block=block, tile=tile, kp=kp)
    bt, btri = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            # SMEM blocks must match the trailing array dims exactly;
            # the [g, 1, kp] layout gives per-tile (1, 1, kp) blocks.
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, 4 * block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    ), sel.reshape(g, 1, kp), lb.reshape(g, 1, kp), nsel.reshape(g, 1, 1),
      r, t0.reshape(n, 1), act.reshape(n, 1), w)
    return bt.reshape(n), btri.reshape(n)


def _walk_ref(sel, lb, r, t0, act, w, tile: int, block: int):
    """jnp mirror (CPU path / oracle): every feasible round, no early
    exit — idempotent under the running min, so it matches the
    early-exiting kernel exactly."""
    return cl._cluster_ref(sel, lb, r, t0, act, w, tile, block,
                           sel.shape[1])


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def intersect_mesh_walk(origin, direction, cm: "cl.ClusterMesh", config,
                        t_init=None, active=None,
                        interpret: bool = False) -> TriHit:
    """Nearest-hit over the cluster mesh; exact (brute-equal) results.

    See module docstring. ``t_init`` bounds the cull and the per-ray
    running min (analytic geoms first); ``active`` lanes cull nothing
    and sort to the back.
    """
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    n = origin.shape[0]
    tile = min(config.cluster_tile, vmem_tile_cap(cm.slab.shape[1]))

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

    shards = max(1, getattr(config, "binned_shards", 1))
    if npad % (tile * shards):
        shards = 1

    # coherence sort (shard-local): octant + origin morton; dead rays
    # and rays missing the mesh root AABB go last.
    from kdtreepathtraceroptimization_tpu.ops.traverse import _coherence_key

    key = _coherence_key(origin, direction, act, cm.root_min, cm.root_max)
    rank, perm = _bin_rank(key, shards)

    direction = jnp.where(act[:, None], direction, 0.0)
    actf = act.astype(jnp.float32)
    x = _ray16(origin, direction, t0, actf)
    x = _apply_perm(x, perm)
    t0s = x[:, 6]
    acts = x[:, 7]

    on_tpu = jax.default_backend() == "tpu" or interpret
    if on_tpu:
        tile_entry = _slab_cull_pallas(x, cm.slab, cm.blk, tile, interpret)
    else:
        tile_entry = _slab_cull_ref(x, cm.slab, cm.blk, tile)
    sel, lb, nsel = _full_select(tile_entry)

    r = mxu_bf.ray_features(x[:, 0:3], x[:, 3:6])
    r = jnp.concatenate(
        [r, jnp.zeros((npad, 6), jnp.float32)], axis=1
    )

    if on_tpu:
        bt, btri = _walk_pallas(sel, lb, nsel, r, t0s, acts, cm.w,
                                tile, cm.block, interpret)
    else:
        bt, btri = _walk_ref(sel, lb, r, t0s, acts, cm.w, tile, cm.block)

    bt = _apply_perm(bt, rank)[:n]
    btri = _apply_perm(btri, rank)[:n]
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))

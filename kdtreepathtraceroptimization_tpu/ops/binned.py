"""Binned cluster-MXU intersection: per-bounce ray binning by nearest
feasible block.

Round 2's cluster path (ops/cluster.py) sorts the wavefront by an
octant+morton proxy key; measured on cornell+dragon the resulting
256-ray tiles still touch 80-119 feasible blocks each, 20-30x over the
per-RAY feasible count of ~3.5-5.7 (exp/bin_stats.py). Since every tile
pays one MXU round per union block, the proxy key is the bottleneck —
and its exactness repair (a full sweep over ALL blocks for ALL tiles)
fires whenever ANY ray overflows the round budget, ~every bounce at
dragon scale.

This module fixes both:

* rays are binned by their ARGMIN-ENTRY block id — the id of the
  feasible block with the smallest conservative entry bound, i.e. "the
  block the entry-ordered walk visits first". Rays that agree on it
  start from the same place and walk nearly identical lists, so tile
  unions collapse toward the per-ray count; rays with NO feasible block
  (dead lanes, rays missing the mesh bounds) share one overflow bin
  whose tiles skip every round.

* the exactness repair is a COMPACTED second pass: the (rare) flagged
  rays are gathered into a small fixed buffer and rerun through the
  same pipeline with the FULL entry-ordered block list per tile
  (rounds = K, affordable at the small scale), which cannot overflow
  and is therefore exact. Only a flagged population larger than the
  buffer (never observed; requires ~every tile to overflow) falls back
  to the full sweep.

Pipeline per call (reference semantics: nearest hit, exact — equal to
brute force; the traversal contract being replaced is
traverseKDbareShortHybrid, /root/reference/src/pathtrace.cu:1023-1235):

  1. argmin cull  (Pallas): per-ray best-entry block id, one fused
                  matmul + running-argmin pass; nothing [N, K] in HBM.
  2. bin          stable counting-sort rank per ray + inverse
                  permutation; applied with one row gather.
  3. tile cull    (reuse cluster._cull_pallas): [tiles, K] tile-min
                  entry bounds on the BINNED order.
  4. select       (reuse cluster._select): entry-ordered per-tile block
                  lists, R = config.binned_rounds.
  5. intersect    (reuse cluster._cluster_pallas): grid (tiles, R)
                  MXU rounds with per-tile early exit.
  6. repair       compacted second pass (above).
  7. un-bin       gather results back by rank.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit

# Repair buffer: flagged rays per call are compacted into this many
# lanes (4 tiles of 1024). Dragon-scale bounces flag well under 1k rays
# once tiles are binned; a larger population falls back to the sweep.
REPAIR_LANES = 4096


# ---------------------------------------------------------------------------
# 1. argmin cull: per-ray nearest feasible block id
# ---------------------------------------------------------------------------


def _argmin_kernel(x_ref, cw_ref, blk_ref, bin_ref, *, kp, tile):
    """Per ray: the feasible block with minimum entry bound, else kp.

    Same cull math as cluster._cull_kernel but reduced along K per RAY
    (not per tile). Output is [tile, 1] i32 (lane-thin but tiny)."""
    sub = tile // 8
    for m in range(8):
        x = x_ref[m * sub:(m + 1) * sub, :]
        prod = jax.lax.dot_general(
            x, cw_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        entry = cl._entry_math(
            x[:, 0:3], x[:, 3:6], x[:, 6:7], x[:, 7:8] > 0.0,
            blk_ref[3:4, :], blk_ref[4:5, :], blk_ref[5:6, :],
            prod[:, :kp], prod[:, kp:],
        )  # [sub, kp]
        best = jnp.min(entry, axis=1, keepdims=True)
        am = jnp.argmin(entry, axis=1).astype(jnp.int32)[:, None]
        bin_ref[m * sub:(m + 1) * sub, :] = jnp.where(
            best < BIG, am, jnp.int32(kp)
        )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _argmin_pallas(x, cull_w, blk, tile: int, interpret: bool):
    import jax.experimental.pallas as pl

    n = x.shape[0]
    kp = blk.shape[1]
    g = n // tile
    kernel = functools.partial(_argmin_kernel, kp=kp, tile=tile)
    out = vm.nondiff_call(pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, 2 * kp), lambda i: (0, 0)),
            pl.BlockSpec((8, kp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=interpret,
    ), x, cull_w, blk)
    return out.reshape(n)


def _argmin_ref(x, cull_w, blk):
    """jnp mirror of the argmin cull (CPU path / oracle)."""
    kp = blk.shape[1]
    prod = x @ cull_w
    entry = cl._entry_math(
        x[:, 0:3], x[:, 3:6], x[:, 6:7], x[:, 7:8] > 0.0,
        blk[3:4, :], blk[4:5, :], blk[5:6, :], prod[:, :kp], prod[:, kp:],
    )
    best = jnp.min(entry, axis=1)
    am = jnp.argmin(entry, axis=1).astype(jnp.int32)
    return jnp.where(best < BIG, am, jnp.int32(kp))


# ---------------------------------------------------------------------------
# 2. binning permutation
# ---------------------------------------------------------------------------


def _bin_rank(bins: jax.Array, shards: int = 1):
    """Stable counting-sort rank: rank[i] = position of ray i in the
    bin-sorted order; perm gathers into that order (rank = perm^-1).

    XLA form (one 2-operand lax.sort + one i32 scatter, ~2.5 + ~5 ms at
    640k on v5e, exp/perm_micro2.py); a Pallas MXU counting-rank is a
    drop-in upgrade if this shows up in profiles.

    ``shards`` > 1 makes the sort SHARD-LOCAL: the ray axis is viewed
    as [shards, n/shards] and each row sorts independently, so under a
    ray-sharded GSPMD program (parallel/sharding.py) no cross-chip
    all-to-all is ever emitted — each chip bins its own rays. perm/rank
    are returned as row-local indices [shards, n/shards]."""
    n = bins.shape[0]
    m = n // shards
    b2 = bins.reshape(shards, m)
    iota = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (shards, m), 1), (shards, m)
    )
    _, perm = jax.lax.sort((b2, iota), num_keys=1, dimension=1)
    # inverse permutation via a second sort, not a scatter: XLA's SPMD
    # partitioner all-gathers batched scatters but keeps dimension-1
    # sorts shard-local (measured on the pairs path, ops/pairs.py r4)
    _, rank = jax.lax.sort((perm, iota), num_keys=1, dimension=1)
    return rank, perm


def _apply_perm(a: jax.Array, perm: jax.Array):
    """Gather rows of a [n, ...] by row-local perm [shards, n/shards]."""
    shards, m = perm.shape
    a2 = a.reshape((shards, m) + a.shape[1:])
    idx = perm.reshape(perm.shape + (1,) * (a2.ndim - 2))
    return jnp.take_along_axis(a2, idx, axis=1).reshape(a.shape)


# ---------------------------------------------------------------------------
# core pipeline (one pass)
# ---------------------------------------------------------------------------


def _binned_pass(x, cm: "cl.ClusterMesh", tile: int, rounds: int,
                 on_tpu: bool, interpret: bool, shards: int = 1):
    """One binned cull+select+intersect pass over x [n, 8] (n a multiple
    of tile*shards; columns o(3) d(3) t0 act). Returns
    (bt, btri, flagged) in the ORIGINAL ray order. Binning is
    shard-local (see _bin_rank)."""
    npad = x.shape[0]
    kp = cm.n_blocks
    rounds = min(rounds, kp)

    if on_tpu:
        bins = _argmin_pallas(x, cm.cull_w, cm.blk, tile, interpret)
    else:
        bins = _argmin_ref(x, cm.cull_w, cm.blk)

    rank, perm = _bin_rank(bins, shards)
    x = _apply_perm(x, perm)
    t0s = x[:, 6]
    acts = x[:, 7]

    if on_tpu:
        tile_entry = cl._cull_pallas(x, cm.cull_w, cm.blk, tile, interpret)
    else:
        tile_entry = cl._cull_ref(x, cm.cull_w, cm.blk, tile)
    sel, lb, lb_over = cl._select(tile_entry, rounds)
    rounds = sel.shape[1]

    r = mxu_bf.ray_features(x[:, 0:3], x[:, 3:6])
    r = jnp.concatenate([r, jnp.zeros((npad, 6), jnp.float32)], axis=1)

    if on_tpu:
        bt, btri = cl._cluster_pallas(sel, lb, r, t0s, acts, cm.w,
                                      tile, block=cm.block, rounds=rounds,
                                      interpret=interpret)
    else:
        bt, btri = cl._cluster_ref(sel, lb, r, t0s, acts, cm.w,
                                   tile, cm.block, rounds)

    over = jnp.repeat(lb_over, tile)
    flagged = (acts > 0) & (over < bt)

    # back to original order (gather by rank — the inverse permutation)
    return (_apply_perm(bt, rank), _apply_perm(btri, rank),
            _apply_perm(flagged, rank))


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def intersect_mesh_binned(origin, direction, cm: "cl.ClusterMesh", config,
                          t_init=None, active=None,
                          interpret: bool = False) -> TriHit:
    """Nearest-hit over the cluster mesh, binned order; exact results.

    Same contract as cluster.intersect_mesh_cluster — see module
    docstring for the pipeline.
    """
    origin = vm.as_rows(origin)
    direction = vm.as_rows(direction)
    n = origin.shape[0]
    tile = config.cluster_tile
    rounds = config.binned_rounds
    kp = cm.n_blocks

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

    # Dead lanes: zero direction -> every MT determinant 0 -> never hit
    # (their cull is also masked via act).
    direction = jnp.where(act[:, None], direction, 0.0)
    actf = act.astype(jnp.float32)
    x = jnp.concatenate(
        [origin, direction, t0[:, None], actf[:, None]], axis=1
    )  # [npad, 8]

    on_tpu = jax.default_backend() == "tpu" or interpret
    shards = max(1, getattr(config, "binned_shards", 1))
    if npad % (tile * shards):
        shards = 1

    bt, btri, flagged = _binned_pass(x, cm, tile, rounds, on_tpu, interpret,
                                     shards)

    # --- exactness repair: compacted second pass --------------------------
    # A flagged ray's tile overflowed `rounds`: its first unselected
    # block could still beat bt. Compact the flagged rays into a small
    # fixed PER-SHARD buffer (one row-local sort, no cross-shard
    # traffic), bound them by their current bt, and rerun with the FULL
    # per-tile block list (rounds = kp — cannot overflow, so the result
    # is exact). The early exit makes the unused rounds ~free at this
    # scale, and sel fits SMEM ([lanes/tile, kp] i32).
    ns = npad // shards
    mr = min(REPAIR_LANES, ns)
    tile2 = min(tile, mr)
    fl2 = flagged.reshape(shards, ns)
    count = jnp.sum(fl2.astype(jnp.int32), axis=1)  # [shards]

    def repair_compact(args):
        bt, btri = args
        iota = jax.lax.broadcasted_iota(jnp.int32, (shards, ns), 1)
        # flagged-first row-local order; pos = source column per slot
        _, pos_full = jax.lax.sort(
            ((~fl2).astype(jnp.int32), iota), num_keys=1, dimension=1
        )
        from kdtreepathtraceroptimization_tpu.ops.pairs import (
            _scatter_back, _take_rows,
        )

        pos = pos_full[:, :mr]                              # [shards, mr]
        live = jax.lax.broadcasted_iota(jnp.int32, (shards, mr), 1) < count[:, None]
        x2 = _take_rows(x.reshape(shards, ns, 8), pos)      # [shards, mr, 8]
        bt_g = _take_rows(bt.reshape(shards, ns), pos)
        livef = live.astype(jnp.float32)
        # re-bound by current best; deactivate padding lanes
        x2 = x2.at[:, :, 6].set(jnp.where(live, bt_g, 0.0))
        x2 = x2.at[:, :, 7].set(x2[:, :, 7] * livef)
        x2 = x2.at[:, :, 3:6].mul(livef[:, :, None])
        bt2, btri2, _ = _binned_pass(x2.reshape(shards * mr, 8), cm, tile2,
                                     kp, on_tpu, interpret, shards)
        bt2 = bt2.reshape(shards, mr)
        btri2 = btri2.reshape(shards, mr)
        upd = live & (btri2 >= 0)
        btri_v = btri.reshape(shards, ns)
        bt_new, btri_new = _scatter_back(
            pos_full,
            [jnp.where(upd, bt2, bt_g),
             jnp.where(upd, btri2, _take_rows(btri_v, pos))],
            [bt.reshape(shards, ns), btri_v])
        return bt_new.reshape(npad), btri_new.reshape(npad)

    def repair_sweep(args):
        # Overflow fallback (flagged population larger than the buffer):
        # t-bounded sweep over every block. Exact, slow, ~never taken.
        bt, btri = args
        r = mxu_bf.ray_features(x[:, 0:3], x[:, 3:6])
        r = jnp.concatenate([r, jnp.zeros((npad, 6), jnp.float32)], axis=1)
        if on_tpu:
            bt2, btri2 = cl._sweep_pallas(r, bt, cm.w, tile, cm.block,
                                          interpret)
        else:
            g = npad // tile
            all_sel = jnp.broadcast_to(
                jnp.arange(kp, dtype=jnp.int32)[None, :], (g, kp)
            )
            bt2, btri2 = cl._cluster_ref(all_sel, None, r, bt, actf,
                                         cm.w, tile, cm.block, kp)
        keep = btri2 >= 0
        return jnp.where(keep, bt2, bt), jnp.where(keep, btri2, btri)

    max_count = jnp.max(count)
    bt, btri = jax.lax.cond(
        max_count > 0,
        lambda args: jax.lax.cond(max_count <= mr, repair_compact,
                                  repair_sweep, args),
        lambda args: args,
        (bt, btri),
    )

    bt, btri = bt[:n], btri[:n]
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))

"""Binned cluster-MXU intersection: per-bounce ray binning by nearest
feasible block.

Round 2's cluster path (ops/cluster.py) sorts the wavefront by an
octant+morton proxy key; measured on cornell+dragon the resulting
256-ray tiles still touch 80-119 feasible blocks each, 20-30x over the
per-RAY feasible count of ~3.5-5.7 (exp/bin_stats.py). Since every tile
pays one MXU round per union block, the proxy key is the bottleneck.

This module bins rays by their ARGMIN-ENTRY block id — the id of the
feasible block with the smallest conservative entry bound, i.e. "the
block the entry-ordered walk visits first". Rays that agree on it start
from the same place and walk nearly identical lists, so tile unions
collapse toward the per-ray count; rays with NO feasible block (dead
lanes, rays that miss the mesh bounds) share one overflow bin whose
tiles skip every round.

Pipeline per call (reference semantics: nearest hit, exact — equal to
brute force; the reference's traversal contract is
pathtrace.cu:1023-1235):

  1. argmin cull  (Pallas): per-ray best-entry block id, one fused
                  matmul + running-argmin pass; nothing [N, K] in HBM.
  2. bin          counting-sort rank per ray (stable) + inverse
                  permutation; applied with one row gather.
  3. tile cull    (reuse cluster._cull_pallas): [tiles, K] tile-min
                  entry bounds on the BINNED order.
  4. select       (reuse cluster._select): entry-ordered per-tile block
                  lists, R = config.binned_rounds.
  5. intersect    (reuse cluster._cluster_pallas): grid (tiles, R)
                  MXU rounds with per-tile early exit.
  6. repair       (reuse cluster._sweep_pallas under lax.cond): any ray
                  whose tile overflowed R and could still be beaten
                  reruns against all blocks — rare by construction.
  7. un-bin       gather results back by rank.

Reference for the contract being replaced: traverseKDbareShortHybrid
(/root/reference/src/pathtrace.cu:1023-1235).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import TriHit


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
    out = pl.pallas_call(
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
    )(x, cull_w, blk)
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


def _bin_rank(bins: jax.Array, n_bins: int) -> jax.Array:
    """Stable counting-sort rank: rank[i] = position of ray i in the
    bin-sorted order. XLA form (argsort + scatter of iota); a Pallas
    MXU counting-rank is a drop-in upgrade if this shows up in
    profiles."""
    n = bins.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((bins, iota), num_keys=1)
    rank = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return rank, perm


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
    n = origin.shape[0]
    tile = config.cluster_tile
    rounds = config.binned_rounds
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

    # Dead lanes: zero direction -> every MT determinant 0 -> never hit
    # (their cull is also masked via act).
    direction = jnp.where(act[:, None], direction, 0.0)
    actf = act.astype(jnp.float32)
    x = jnp.concatenate(
        [origin, direction, t0[:, None], actf[:, None]], axis=1
    )  # [npad, 8]

    on_tpu = jax.default_backend() == "tpu" or interpret

    # 1. per-ray argmin-entry block id
    if on_tpu:
        bins = _argmin_pallas(x, cm.cull_w, cm.blk, tile, interpret)
    else:
        bins = _argmin_ref(x, cm.cull_w, cm.blk)

    # 2. stable counting-sort by bin; apply with ONE row gather
    rank, perm = _bin_rank(bins, kp + 1)
    x = x[perm]
    t0s = x[:, 6]
    acts = x[:, 7]

    # 3-4. tile-min entry bounds + entry-ordered selection (binned order)
    if on_tpu:
        tile_entry = cl._cull_pallas(x, cm.cull_w, cm.blk, tile, interpret)
    else:
        tile_entry = cl._cull_ref(x, cm.cull_w, cm.blk, tile)
    sel, lb, lb_over = cl._select(tile_entry, rounds)
    rounds = sel.shape[1]

    r = mxu_bf.ray_features(x[:, 0:3], x[:, 3:6])
    r = jnp.concatenate([r, jnp.zeros((npad, 6), jnp.float32)], axis=1)

    # 5. MXU rounds with per-tile early exit
    if on_tpu:
        bt, btri = cl._cluster_pallas(sel, lb, r, t0s, acts, cm.w,
                                      tile, block, rounds, interpret)
    else:
        bt, btri = cl._cluster_ref(sel, lb, r, t0s, acts, cm.w,
                                   tile, block, rounds)

    # 6. exactness repair (see cluster.intersect_mesh_cluster)
    over = jnp.repeat(lb_over, tile)
    flagged = (acts > 0) & (over < bt)

    def repair(args):
        bt, btri = args
        if on_tpu:
            bt2, btri2 = cl._sweep_pallas(r, bt, cm.w, tile, block, interpret)
        else:
            g = npad // tile
            all_sel = jnp.broadcast_to(
                jnp.arange(kp, dtype=jnp.int32)[None, :], (g, kp)
            )
            bt2, btri2 = cl._cluster_ref(all_sel, None, r, bt, acts,
                                         cm.w, tile, block, kp)
        keep = btri2 >= 0
        return jnp.where(keep, bt2, bt), jnp.where(keep, btri2, btri)

    bt, btri = jax.lax.cond(
        jnp.any(flagged), repair, lambda a: a, (bt, btri)
    )

    # 7. un-bin: ray i's result sits at its rank in the sorted order
    bt = bt[rank][:n]
    btri = btri[rank][:n]
    bt = jnp.where(btri >= 0, bt, BIG)
    zero = jnp.zeros((n,), jnp.float32)
    return jax.lax.stop_gradient(TriHit(t=bt, tri=btri, u=zero, v=zero))

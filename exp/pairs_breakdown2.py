"""Stage-by-stage timing of the runs-based _pair_pass at dragon scale
(TPU). Deltas isolate: extract / narrow-compact / packed sort /
od-gather / runs kernel / back-sort / reduce / composites.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import pairs as pr
from kdtreepathtraceroptimization_tpu.ops import walk as wk
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from bench import _mesh_scene

REPS = int(os.environ.get("REPS", "6"))
scene, n_tris, label = _mesh_scene(800, None)
cm = scene.cmesh
config = RenderConfig(cluster=True, cluster_pairs=True)
tile, F, ptile = config.cluster_tile, config.pair_slots, config.pair_tile
ptile = int(os.environ.get("PTILE", ptile))
F = int(os.environ.get("F", F))
import dataclasses
config = dataclasses.replace(config, pair_slots=F, pair_tile=ptile)
kp = cm.n_blocks
kreal = cm.n_real_blocks
block = cm.block
print(f"{label} {n_tris} tris tile={tile} F={F} ptile={ptile} kp={kp} "
      f"kreal={kreal} block={block}", flush=True)

w = np.load("/tmp/wave.npz")
o = jnp.asarray(w["o"]) - cm.center_shift
d = jnp.asarray(w["d"])
t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
n = o.shape[0]
act = jnp.ones((n,), jnp.float32)
x = wk._ray16(o, d, t0, act)


def timeit(label, fn, init, reps=REPS):
    f = jax.jit(lambda c: jax.tree.map(
        lambda a: jnp.sum(a.astype(jnp.float32)),
        jax.lax.fori_loop(0, reps, lambda i, c: fn(c), init)))
    v = float(np.asarray(jax.tree.leaves(f(init))[0]))
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        v = float(np.asarray(jax.tree.leaves(f(init))[0]))
        best = min(best, time.perf_counter() - t)
    per = best / reps
    print(f"{label:16s} {per*1e3:9.2f} ms  ({per/n*1e9:6.1f} ns/ray) v={v:.3g}",
          flush=True)
    return per


# --- extract ---------------------------------------------------------
def extract(c):
    ids, lbov, cnt, feat = pr._extract_pallas(c, cm.slab, cm.blk, tile, F,
                                              False)
    return c + 0.0 * (lbov[:, None] + feat[:, :1])

timeit("extract", extract, x)

ids0, lbov0, cnt0, feat_full = pr._extract_pallas(x, cm.slab, cm.blk, tile,
                                                  F, False)
npad = n
m1 = max(ptile, -(-npad // 2 // ptile) * ptile)
print(f"mesh_act={int(jnp.sum(cnt0 > 0))} of {n}  m1={m1}", flush=True)

# --- narrowing compaction (one round) --------------------------------
iota_n = jnp.arange(npad, dtype=jnp.int32)


def narrow(c):
    todo = c > 0
    _, pos = jax.lax.sort(((~todo).astype(jnp.int32), iota_n), num_keys=1)
    pos = pos[:m1]
    nr = jnp.sum(todo.astype(jnp.int32))
    live = jnp.arange(m1, dtype=jnp.int32) < jnp.minimum(nr, m1)
    ids_c = jnp.where(live[:, None], ids0[pos], jnp.int32(kp))
    ft_c = feat_full[pos] * live.astype(jnp.float32)[:, None]
    return c + 0 * (ids_c[0, 0] + ft_c[0, 0].astype(jnp.int32))

timeit("narrow_compact", narrow, cnt0)

todo = cnt0 > 0
_, pos = jax.lax.sort(((~todo).astype(jnp.int32), iota_n), num_keys=1)
pos = pos[:m1]
nr = jnp.sum(todo.astype(jnp.int32))
live = jnp.arange(m1, dtype=jnp.int32) < jnp.minimum(nr, m1)
ids_c = jnp.where(live[:, None], ids0[pos], jnp.int32(kp))
ft_c = feat_full[pos] * live.astype(jnp.float32)[:, None]

nn, FF = ids_c.shape
P = nn * FF
p2bits = (P - 1).bit_length()
print(f"P={P} p2bits={p2bits}", flush=True)
iota_p = jnp.arange(P, dtype=jnp.int32)


# --- packed 1-op sort ------------------------------------------------
def psort(c):
    keys = (c.reshape(P) << p2bits) | iota_p
    keys_s = jax.lax.sort(keys)
    return c + 0 * keys_s.reshape(c.shape)

timeit("packed_sort", psort, ids_c)

keys_s0 = jax.lax.sort((ids_c.reshape(P) << p2bits) | iota_p)
src0 = keys_s0 & ((1 << p2bits) - 1)
blk_s0 = keys_s0 >> p2bits


# --- feat gather -----------------------------------------------------
def ftg(c):
    ft = ft_c[c // FF]
    return c + 0 * ft[:, 0].astype(jnp.int32)

timeit("feat_gather", ftg, src0)

feat0 = ft_c[src0 // FF]


# --- runs kernel -----------------------------------------------------
def kern(c):
    p_s = pr._pair_runs_pallas(blk_s0, c, cm.w, block, ptile,
                               kreal, False)
    return c + 0 * p_s[:, None].astype(jnp.float32)

timeit("runs_kernel", kern, feat0)

p_s0 = pr._pair_runs_pallas(blk_s0, feat0, cm.w, block, ptile,
                            kreal, False)


# --- back-sort (2-op packed) -----------------------------------------
def backsort(c):
    _, p_p = jax.lax.sort((src0, c), num_keys=1)
    return c + 0 * p_p

timeit("back_sort2", backsort, p_s0)

_, p_p0 = jax.lax.sort((src0, p_s0), num_keys=1)
t_p0, loc_p0 = pr._unpack_tl(p_p0.reshape(nn, FF))


# --- reduce ----------------------------------------------------------
def reduce_(c):
    t_best = jnp.min(c, axis=1)
    is_min = c == t_best[:, None]
    first = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
    blk_best = jnp.sum(jnp.where(first, ids_c, 0), axis=1)
    loc_best = jnp.sum(jnp.where(first, loc_p0, 0), axis=1)
    tri = jnp.where(t_best < BIG, blk_best * block + loc_best, -1)
    return c + 0 * (t_best[:, None] + tri[:, None].astype(jnp.float32))

timeit("reduce", reduce_, t_p0)


# --- composite: _pair_pass on compacted input ------------------------
def pp(c):
    t1, tri1 = pr._pair_pass(ids_c, c, cm, ptile, kreal, True, False)
    return c + 0 * t1[:, None]

timeit("_pair_pass", pp, ft_c)


# --- composites: full public entry -----------------------------------
def pass1(c):
    hit = pr.intersect_mesh_pairs(c + cm.center_shift, d, cm, config,
                                  t_init=t0, max_passes=1)
    return c + 0.0 * hit.t[:, None]

timeit("pass1_full", pass1, o)


def full(c):
    hit = pr.intersect_mesh_pairs(c + cm.center_shift, d, cm, config,
                                  t_init=t0)
    return c + 0.0 * hit.t[:, None]

timeit("full", full, o)

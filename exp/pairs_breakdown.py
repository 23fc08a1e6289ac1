"""Per-stage timing of the pairs intersector at dragon scale on TPU.

Chained (REPS per dispatch) on the real diffuse wavefront; scalars
reduced inside the jit. Stages build cumulatively so deltas give each
stage's cost.
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
from kdtreepathtraceroptimization_tpu.ops import mxu_bf, walk as wk
from bench import _mesh_scene

REPS = int(os.environ.get("REPS", "6"))
scene, n_tris, label = _mesh_scene(800, None)
cm = scene.cmesh
config = RenderConfig(cluster=True, cluster_pairs=True)
tile, F, ptile = config.cluster_tile, config.pair_slots, config.pair_tile
kp = cm.n_blocks
kreal = cm.n_real_blocks
print(f"{label} {n_tris} tris tile={tile} F={F} ptile={ptile} kp={kp}",
      flush=True)

w = np.load("/tmp/wave.npz")
o = jnp.asarray(w["o"]) - cm.center_shift
d = jnp.asarray(w["d"])
t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
n = o.shape[0]
act = jnp.ones((n,), jnp.float32)
x = wk._ray16(o, d, t0, act)
r = mxu_bf.ray_features(o, d)
r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)


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
    print(f"{label:14s} {per*1e3:9.2f} ms  ({per/n*1e9:6.1f} ns/ray) v={v:.3g}",
          flush=True)


def extract(c):
    ids, lbov, cnt = pr._extract_pallas(c, cm.slab_w, cm.blk, tile, F, False)
    return c + 0.0 * lbov[:, None]


timeit("extract", extract, x)

ids0, lbov0, cnt0 = pr._extract_pallas(x, cm.slab_w, cm.blk, tile, F, False)
P = n * F
keys0 = ids0.reshape(P)
pidx_a = jnp.arange(P, dtype=jnp.int32)


def sortstage(c):
    keys_s, pidx_s = jax.lax.sort((c, pidx_a), num_keys=1)
    return c ^ (keys_s & 0)


timeit("sort2.56M", sortstage, keys0)

keys_s0, pidx_s0 = jax.lax.sort((keys0, pidx_a), num_keys=1)
nb = kp + 1
s_max = P + nb * ptile


def align(c):
    keys_s, pidx_s = c
    bounds = jnp.searchsorted(keys_s, jnp.arange(nb, dtype=jnp.int32))
    cnt = jnp.diff(jnp.concatenate([bounds, jnp.asarray([P], jnp.int32)]))
    acnt = (cnt + ptile - 1) // ptile * ptile
    aoff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(acnt, dtype=jnp.int32)])
    slot = jnp.arange(s_max, dtype=jnp.int32)
    blk_of = jnp.searchsorted(aoff, slot, side="right").astype(jnp.int32) - 1
    blk_of = jnp.clip(blk_of, 0, nb - 1)
    within = slot - aoff[blk_of]
    src = bounds[blk_of] + within
    valid = (within < cnt[blk_of]) & (slot < aoff[nb])
    src = jnp.where(valid, src, 0)
    slot_p = jnp.where(valid, pidx_s[src], -1)
    return (keys_s, pidx_s ^ (slot_p & 0))


timeit("alignmath", align, (keys_s0, pidx_s0))


def featgather(c):
    slot_ray = jnp.abs(c) % n
    feat = r[slot_ray]
    return c + (feat[:, 0] * 0.0).astype(jnp.int32)


slot0 = jnp.arange(s_max, dtype=jnp.int32)
timeit("featgather", featgather, slot0)


def backsort(c):
    kb, t_s, loc_s = c
    _, t_p, loc_p = jax.lax.sort((kb, t_s, loc_s), num_keys=1)
    return (kb, t_p, loc_p)


timeit("backsort", backsort,
       (slot0 % P, jnp.zeros((s_max,), jnp.float32),
        jnp.zeros((s_max,), jnp.int32)))


def pass1(c):
    hit = pr.intersect_mesh_pairs(c + cm.center_shift, d, cm, config,
                                  t_init=t0, max_passes=1)
    return c + 0.0 * hit.t[:, None]


timeit("pass1_full", pass1, o)


def pass12(c):
    hit = pr.intersect_mesh_pairs(c + cm.center_shift, d, cm, config,
                                  t_init=t0, max_passes=2)
    return c + 0.0 * hit.t[:, None]


timeit("pass12", pass12, o)


def full(c):
    hit = pr.intersect_mesh_pairs(c + cm.center_shift, d, cm, config,
                                  t_init=t0)
    return c + 0.0 * hit.t[:, None]


timeit("full", full, o)

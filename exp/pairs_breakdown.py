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
    ids, lbov, cnt = pr._extract_pallas(c, cm.slab, cm.blk, tile, F, False)
    return c + 0.0 * lbov[:, None]


timeit("extract", extract, x)

ids0, lbov0, cnt0 = pr._extract_pallas(x, cm.slab, cm.blk, tile, F, False)
P = n * F
keys0 = ids0.reshape(P)
pidx_a = jnp.arange(P, dtype=jnp.int32)


def sortstage(c):
    keys_s, pidx_s = jax.lax.sort((c, pidx_a), num_keys=1)
    return c ^ (keys_s & 0)


timeit("sort2.56M", sortstage, keys0)



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

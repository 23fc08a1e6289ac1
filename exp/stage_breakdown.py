"""Per-stage timing of the binned intersector at dragon scale on TPU.

Uses the REAL diffuse-bounce wavefront (/tmp/wave.npz from
exp/dump_wave.py) so feasible-set sizes are representative. Each stage
is chained REPS times inside one jit (tunnel dispatch ~50-100 ms);
outputs are reduced to scalars inside the jit (no bulk transfers).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import binned as bn
from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from bench import _mesh_scene

REPS = int(os.environ.get("REPS", "8"))

scene, n_tris, label = _mesh_scene(800, None)
cm = scene.cmesh
config = RenderConfig(cluster=True, cluster_binned=True)
tile, rounds = config.cluster_tile, config.binned_rounds
kp = cm.n_blocks
print(f"{label} {n_tris} tris, tile={tile} rounds={rounds} kp={kp}", flush=True)

w = np.load("/tmp/wave.npz")
o = jnp.asarray(w["o"]) - cm.center_shift
d = jnp.asarray(w["d"])
t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
n = o.shape[0]
act = jnp.ones((n, 1), jnp.float32)
x = jnp.concatenate([o, d, t0[:, None], act], axis=1)
r = mxu_bf.ray_features(o, d)
r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)


def timeit(label, fn, *args, reps=REPS):
    def chained(*a):
        def body(i, c):
            out = fn(*a)
            return c + sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(out))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    f = jax.jit(chained)
    v = float(np.asarray(f(*args)))
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        v = float(np.asarray(f(*args)))
        best = min(best, time.perf_counter() - t)
    per = best / reps
    print(f"{label:16s} {per*1e3:9.2f} ms  ({per/n*1e9:6.1f} ns/ray)  v={v:.3g}",
          flush=True)


# NOTE: fn re-executes identically each loop iter; XLA may CSE the
# fori body to one call. Add data dependency via args where possible.
def timeit_dep(label, fn, init, reps=REPS):
    """fn(carry) -> carry with a real dependency chain."""
    f = jax.jit(lambda c: jax.tree.map(
        lambda a: jnp.sum(a.astype(jnp.float32)),
        jax.lax.fori_loop(0, reps, lambda i, c: fn(c), init)))
    v = jax.tree.leaves(f(init))[0]
    v = float(np.asarray(v))
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        v = float(np.asarray(jax.tree.leaves(f(init))[0]))
        best = min(best, time.perf_counter() - t)
    per = best / reps
    print(f"{label:16s} {per*1e3:9.2f} ms  ({per/n*1e9:6.1f} ns/ray)  v={v:.3g}",
          flush=True)


# 1. argmin cull (chain: perturb x by result parity)
timeit_dep("argmin_cull",
           lambda c: c.at[:, 6].add(
               (bn._argmin_pallas(c, cm.cull_w, cm.blk, tile, False) % 2)
               .astype(jnp.float32) * 0.0),
           x)

# 2. tile cull
timeit_dep("tile_cull",
           lambda c: c.at[:, 6].add(
               cl._cull_pallas(c, cm.cull_w, cm.blk, tile, False).sum() * 0.0),
           x)

# 3. cull + select
def cull_select(c):
    te = cl._cull_pallas(c, cm.cull_w, cm.blk, tile, False)
    sel, lb, lb_over = cl._select(te, rounds)
    return c.at[:, 6].add(jnp.float32(0.0) * sel.sum())
timeit_dep("cull+select", cull_select, x)

# 4. bin_rank + apply_perm
def binperm(c):
    bins = bn._argmin_pallas(c, cm.cull_w, cm.blk, tile, False)
    rank, perm = bn._bin_rank(bins)
    return bn._apply_perm(c, perm)
timeit_dep("argmin+rank+perm", binperm, x)

# 5. cluster kernel with REAL sel/lb (precomputed once from binned order)
bins0 = bn._argmin_pallas(x, cm.cull_w, cm.blk, tile, False)
rank0, perm0 = bn._bin_rank(bins0)
xs = bn._apply_perm(x, perm0)
te = cl._cull_pallas(xs, cm.cull_w, cm.blk, tile, False)
sel0, lb0, lbo0 = cl._select(te, rounds)
rs = mxu_bf.ray_features(xs[:, 0:3], xs[:, 3:6])
rs = jnp.concatenate([rs, jnp.zeros((n, 6), jnp.float32)], axis=1)
t0s = xs[:, 6]
acts = xs[:, 7]
sel0, lb0 = jax.block_until_ready((sel0, lb0))
nflag_est = None

def cluster_only(c):
    bt, btri = cl._cluster_pallas(sel0, lb0, c, t0s, acts, cm.w,
                                  tile, cm.block, int(sel0.shape[1]), False)
    return c + 0.0 * bt[:, None]
timeit_dep("cluster_kernel", cluster_only, rs)

# flagged count under this budget (diagnostic)
bt, btri = cl._cluster_pallas(sel0, lb0, rs, t0s, acts, cm.w,
                              tile, cm.block, int(sel0.shape[1]), False)
over = jnp.repeat(lbo0, tile)
flagged = (acts > 0) & (over < bt)
print(f"flagged: {int(jnp.sum(flagged))} / {n}", flush=True)

# 6. full binned pass
def full_pass(c):
    bt, btri, fl = bn._binned_pass(c, cm, tile, rounds, True, False)
    return c + 0.0 * bt[:, None]
timeit_dep("binned_pass", full_pass, x)

# 7. full public intersect
def full(c):
    hit = bn.intersect_mesh_binned(c[:, 0:3] + cm.center_shift, c[:, 3:6],
                                   cm, config, t_init=c[:, 6])
    return c + 0.0 * hit.t[:, None]
timeit_dep("intersect_full", full, x)

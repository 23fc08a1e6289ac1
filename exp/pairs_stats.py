"""Wavefront stats for pass2 tuning on the dumped diffuse wave (TPU):
active fraction, feasible-count distribution, unproven counts, and how
many unproven rays exceed candidate F2 windows."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import pairs as pr, walk as wk
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from bench import _mesh_scene

scene, n_tris, label = _mesh_scene(800, None)
cm = scene.cmesh
config = RenderConfig(cluster=True, cluster_pairs=True)
w = np.load("/tmp/wave.npz")
o = jnp.asarray(w["o"]) - cm.center_shift
d = jnp.asarray(w["d"])
t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
n = o.shape[0]
act = jnp.ones((n,), jnp.float32)
x = wk._ray16(o, d, t0, act)
F = config.pair_slots

ids, lbov, cnt = jax.jit(lambda x: pr._extract_pallas(
    x, cm.slab, cm.blk, config.cluster_tile, F, False))(x)
cnt = np.asarray(cnt)
print(f"n={n} active(cnt>0)={np.mean(cnt>0):.3f} mean_cnt={cnt.mean():.2f} "
      f"p95={np.percentile(cnt,95):.0f} p99={np.percentile(cnt,99):.0f} "
      f"max={cnt.max()}", flush=True)

hit = pr.intersect_mesh_pairs(o + cm.center_shift, d, cm, config,
                              t_init=t0, max_passes=1)
bt = np.minimum(np.asarray(hit.t), np.asarray(t0))
lbov = np.asarray(lbov)
unp = (lbov < bt) & (cnt > F)
print(f"unproven after pass1: {unp.sum()} ({unp.mean()*100:.2f}%)", flush=True)
for f2 in (8, 10, 12, 16, 20):
    over = unp & (cnt > f2)
    print(f"  F2={f2}: unproven with cnt>F2 = {over.sum()} "
          f"({over.mean()*100:.3f}%)", flush=True)
print("cnt histogram over unproven:",
      np.percentile(cnt[unp], [50, 90, 95, 99]).round(1) if unp.any() else "-",
      flush=True)

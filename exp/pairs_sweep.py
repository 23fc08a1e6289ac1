"""Sweep pair-intersector knobs (ptile, F) on the dumped diffuse wave."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import pairs as pr
from bench import _mesh_scene

REPS = 6
scene, n_tris, label = _mesh_scene(800, None)
cm = scene.cmesh
w = np.load("/tmp/wave.npz")
o = jnp.asarray(w["o"])
d = jnp.asarray(w["d"])
t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
n = o.shape[0]


def timeit(tag, config, max_passes=3):
    def fn(c):
        hit = pr.intersect_mesh_pairs(c, d, cm, config, t_init=t0,
                                      max_passes=max_passes)
        return c + 0.0 * hit.t[:, None]

    f = jax.jit(lambda c: jnp.sum(
        jax.lax.fori_loop(0, REPS, lambda i, c: fn(c), c)))
    v = float(np.asarray(f(o)))
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        v = float(np.asarray(f(o)))
        best = min(best, time.perf_counter() - t)
    per = best / REPS
    print(f"{tag:24s} {per*1e3:8.2f} ms ({per/n*1e9:6.1f} ns/ray) v={v:.6g}",
          flush=True)


for ptile in (256, 512, 1024):
    timeit(f"ptile={ptile}", RenderConfig(
        cluster=True, cluster_pairs=True, pair_tile=ptile))
for F in (3, 4, 6):
    timeit(f"F={F}", RenderConfig(
        cluster=True, cluster_pairs=True, pair_slots=F))

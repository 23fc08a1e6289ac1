"""Iteration-level breakdown on the real TPU: where do the ~seconds of
a full 800x800 depth-8 pairs iteration go?

Times (chained on-device, scalar-forced):
  full        trace_iteration, pairs intersector
  nomesh      trace_iteration with the mesh stripped (analytic-only):
              raygen + geoms + bsdf + shade + rng = everything-else
  The difference is the total mesh-intersection cost per iteration.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
from bench import _mesh_scene

RES = 800
ITERS = 4
scene, n_tris, label = _mesh_scene(RES, None)
print(f"{label} {n_tris}", flush=True)
n = RES * RES
key = jax.random.PRNGKey(0)


def timeit(tag, scn, cfg):
    block = make_render_block_fn(scn, cfg, ITERS)
    f0 = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
    float(np.asarray(f0[0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        f = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
        float(np.asarray(f[0, 0]))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{tag:10s} {best*1e3:8.1f} ms/iter "
          f"({n*8/best/1e6:6.2f} Mrays/s)", flush=True)
    return best


base = dict(trace_depth=8, antialias=True, scan_bounces=True)
nomesh_scene = scene._replace(mesh=None, kd=None, cmesh=None)
t_nomesh = timeit("nomesh", nomesh_scene, RenderConfig(**base))
t_full = timeit("pairs", scene, RenderConfig(
    **base, cluster=True, cluster_pairs=True))
t_walk = timeit("walk", scene, RenderConfig(
    **base, cluster=True, cluster_walk=True, cluster_pairs=False))
print(f"mesh cost pairs: {(t_full-t_nomesh)*1e3:.1f} ms/iter "
      f"({(t_full-t_nomesh)/8/n*1e9:.0f} ns/ray/bounce)", flush=True)
print(f"mesh cost walk : {(t_walk-t_nomesh)*1e3:.1f} ms/iter "
      f"({(t_walk-t_nomesh)/8/n*1e9:.0f} ns/ray/bounce)", flush=True)

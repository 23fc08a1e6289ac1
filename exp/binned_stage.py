"""Time the binned intersector at dragon scale on the real TPU.

phase 1: one intersect_mesh_binned call (640k rays, dragon 100k tris)
phase 2: one full render iteration (800x800, depth 8, binned)
phase 3: render block of 5 iterations in one dispatch
Timing by chaining REPS calls in one jit (tunnel dispatch ~50-100 ms).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import binned as bn
from bench import _mesh_scene

phase = int(sys.argv[1]) if len(sys.argv) > 1 else 1
res = 800
print(f"phase {phase}: devices={jax.devices()}", flush=True)
scene, n_tris, label = _mesh_scene(res, None)
print(f"scene: {label} {n_tris} tris", flush=True)
cm = scene.cmesh
config = RenderConfig(trace_depth=8, antialias=True, cluster=True,
                      cluster_binned=True, scan_bounces=True)
n = res * res

if phase == 1:
    rng = np.random.default_rng(0)
    origin = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    direction = jnp.asarray(d)
    REPS = 8

    def once(i, o):
        hit = bn.intersect_mesh_binned(o, direction, cm, config)
        return o + 1e-9 * hit.t[:, None]

    f = jax.jit(lambda o: jax.lax.fori_loop(0, REPS, once, o).sum())
    t0 = time.perf_counter()
    v = float(np.asarray(f(origin)))
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(np.asarray(f(origin)))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(f"intersect: {per*1e3:.1f} ms/call  ({per/n*1e9:.1f} ns/ray)  val={v:.3f}",
          flush=True)
elif phase in (2, 3):
    from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
    iters = 1 if phase == 2 else 5
    block = make_render_block_fn(scene, config, iters)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
    v = float(np.asarray(film[0, 0]))
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    it0 = 1 + iters
    for _ in range(3):
        t0 = time.perf_counter()
        film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(it0))
        v = float(np.asarray(film[0, 0]))
        best = min(best, time.perf_counter() - t0)
        it0 += iters
    per = best / iters
    rays = n * 8 / per
    print(f"iter: {per*1e3:.1f} ms  ({rays/1e6:.1f} Mrays/s, vs_baseline "
          f"{rays/(800*800*8/0.0794):.3f})", flush=True)

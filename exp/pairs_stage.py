"""Time the pairs intersector at dragon scale on the real TPU.
phase 1: chained intersect on the real diffuse wavefront
phase 2: one full render iteration (800x800, depth 8, pairs)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import pairs as pr
from bench import _mesh_scene

phase = int(sys.argv[1]) if len(sys.argv) > 1 else 1
res = 800
print(f"phase {phase}: devices={jax.devices()}", flush=True)
scene, n_tris, label = _mesh_scene(res, None)
print(f"scene: {label} {n_tris} tris", flush=True)
cm = scene.cmesh
n = res * res

if phase == 1:
    w = np.load("/tmp/wave.npz")
    o = jnp.asarray(w["o"]); d = jnp.asarray(w["d"])
    t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
    REPS = int(os.environ.get("REPS", "4"))
    config = RenderConfig(cluster=True, cluster_pairs=True)
    def once(i, c):
        hit = pr.intersect_mesh_pairs(c, d, cm, config, t_init=t0)
        return c + 0.0 * hit.t[:, None]
    f = jax.jit(lambda c: jax.lax.fori_loop(0, REPS, once, c).sum())
    t = time.perf_counter()
    v = float(np.asarray(f(o)))
    print(f"compile+run {time.perf_counter()-t:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        v = float(np.asarray(f(o)))
        best = min(best, time.perf_counter() - t)
    per = best / REPS
    print(f"pairs {per*1e3:.1f} ms/call ({per/n*1e9:.1f} ns/ray) val={v:.3g}",
          flush=True)
elif phase == 2:
    from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
    config = RenderConfig(trace_depth=8, antialias=True, cluster=True,
                          cluster_pairs=True, scan_bounces=True)
    iters = 2
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

"""Reproduce the nomesh 2 s/iter: time trace_iteration (no mesh) and a
hand-inlined bounce loop in the same process, same style."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import trace_iteration
from bench import _mesh_scene

RES = 800
scene, n_tris, label = _mesh_scene(RES, None)
n = RES * RES
key = jax.random.PRNGKey(0)

for tag, cfg in [
    ("scan", RenderConfig(trace_depth=8, antialias=True, scan_bounces=True)),
    ("unroll", RenderConfig(trace_depth=8, antialias=True, scan_bounces=False)),
]:
    @jax.jit
    def step(film, it):
        return film + trace_iteration(
            scene.geoms, scene.materials, None, None, scene.camera, cfg,
            key, it)

    @jax.jit
    def block(film):
        return jax.lax.fori_loop(0, 4, lambda i, f: step(f, i), film)[0, 0]

    v = block(jnp.zeros((n, 3), jnp.float32))
    float(np.asarray(v))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(block(jnp.zeros((n, 3), jnp.float32))))
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"nomesh {tag:7s} {best*1e3:8.1f} ms/iter ({best/8/n*1e9:5.1f} ns/ray/bounce)",
          flush=True)

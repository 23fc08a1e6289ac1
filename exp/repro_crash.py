"""Reproduce the BENCH_r02 TPU worker crash, scaling up in stages.

Stage 1: icosphere subdiv3 (1280 tris), 256x256, cluster, 2 iters
Stage 2: icosphere subdiv5 (20480 tris), 512x512, cluster, 3 iters
Stage 3: dragon (100k tris), 800x800, cluster, 10 iters  (bench config)

Run: python exp/repro_crash.py <stage>
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
from bench import _mesh_scene

stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1
res, subdiv, iters = {
    1: (256, 3, 2),
    2: (512, 5, 3),
    3: (800, None, 10),
}[stage]

print(f"stage {stage}: devices={jax.devices()}", flush=True)
scene, n_tris, label = _mesh_scene(res, subdiv)
print(f"scene loaded: {label} {n_tris} tris", flush=True)

config = RenderConfig(trace_depth=8, antialias=True, cluster=True,
                      scan_bounces=True)
block = make_render_block_fn(scene, config, iters)
n = res * res
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
v = float(film[0, 0])
print(f"stage {stage} OK: warmup {time.perf_counter()-t0:.1f}s film[0,0]={v}",
      flush=True)

t0 = time.perf_counter()
film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1 + iters))
v = float(film[0, 0])
dt = (time.perf_counter() - t0) / iters
print(f"stage {stage} timed: {dt*1e3:.1f} ms/iter -> "
      f"{n*8/dt/1e6:.1f} Mrays/s", flush=True)

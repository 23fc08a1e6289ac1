"""Single-config dragon timing with per-stage breakdown."""
import sys, time, json
import jax, jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_fn

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 800
LEAF = int(sys.argv[2]) if len(sys.argv) > 2 else 64
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 8

t0 = time.time()
scene = load_scene('scenes/cornell.txt',
                   obj_path='/root/reference/scenes/dragon.obj',
                   mtl_dir='/root/reference/scenes', leaf_size=LEAF)
scene = with_resolution(scene, RES, RES)
print('build', round(time.time()-t0,1), 'rows', scene.kd.fat.count, 'cap',
      scene.kd.fat.inline_cap, 'depth', scene.kd.max_depth, flush=True)

config = RenderConfig(trace_depth=DEPTH, antialias=True, enable_kd=True)
step = make_render_fn(scene, config)
n = RES * RES
key = jax.random.PRNGKey(0)
t0 = time.time()
film = step(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
film.block_until_ready(); float(film[0,0])
print('compile+first', round(time.time()-t0,1), flush=True)
for it in range(2, 5):
    t0 = time.time()
    film = step(film, key, jnp.int32(it))
    float(film[0,0])
    dt = time.time()-t0
    print(json.dumps({'iter': it, 's': round(dt,2),
                      'Mrays_s': round(n*DEPTH/dt/1e6, 2)}), flush=True)

"""On-chip experiment: cornell+dragon.obj iteration time vs KD leaf size.

The fat-row gather cost is (measured r1) roughly flat in row WIDTH but
stepped in row COUNT; bigger leaves -> wider rows, fewer rows, fewer
steps per ray. This measures where the optimum sits on a real v5e for
the headline 100k-tri dragon config (800x800, depth 8).
"""
import sys, time, json
import jax, jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 800
ITERS = 3
DEPTH = 8
leaves = [int(x) for x in (sys.argv[2].split(',') if len(sys.argv) > 2 else [8, 16, 32, 64, 128])]

for leaf in leaves:
    t0 = time.time()
    scene = load_scene('scenes/cornell.txt',
                       obj_path='/root/reference/scenes/dragon.obj',
                       mtl_dir='/root/reference/scenes', leaf_size=leaf)
    scene = with_resolution(scene, RES, RES)
    build_s = time.time() - t0
    kd = scene.kd
    config = RenderConfig(trace_depth=DEPTH, antialias=True, enable_kd=True)
    block = make_render_block_fn(scene, config, ITERS)
    n = RES * RES
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
    float(film[0, 0])
    compile_s = time.time() - t0
    best = float('inf')
    it0 = 1 + ITERS
    for _ in range(2):
        film = jnp.zeros((n, 3), jnp.float32)
        t0 = time.time()
        film = block(film, key, jnp.int32(it0))
        float(film[0, 0])
        best = min(best, (time.time() - t0) / ITERS)
        it0 += ITERS
    rays = n * DEPTH / best
    print(json.dumps({
        'leaf': leaf, 'rows': kd.fat.count, 'cap': kd.fat.inline_cap,
        'nodes': kd.nodes.count, 'depth': kd.max_depth,
        'oct': kd.oct is not None,
        'build_s': round(build_s, 2), 'compile_s': round(compile_s, 1),
        'ms_per_iter': round(best * 1e3, 1), 'rays_per_s': round(rays / 1e6, 2),
    }), flush=True)

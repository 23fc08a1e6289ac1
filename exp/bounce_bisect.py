"""Time each non-mesh stage of the bounce body on the real TPU at
dragon-bench scale (n=640k, 8 reps chained)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import bsdf, intersect as isect, shade
from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key, uniforms
from bench import _mesh_scene

RES = 800
REPS = 8
scene, n_tris, label = _mesh_scene(RES, None)
n = RES * RES
config = RenderConfig(trace_depth=8, antialias=True, scan_bounces=True)
key = jax.random.PRNGKey(0)
geoms, materials = scene.geoms, scene.materials
print("geoms:", jax.tree.map(lambda a: getattr(a, 'shape', a), geoms._asdict()
      if hasattr(geoms, '_asdict') else geoms), flush=True)

rays = jax.jit(lambda k: generate_rays(scene.camera, config, k, 8))(key)
jax.block_until_ready(rays)
o, d = rays.origin, rays.direction
hit0 = jax.jit(lambda o, d: isect.intersect_geoms(o, d, geoms))(o, d)
mat0 = jax.jit(lambda h: bsdf.gather_materials(materials, h.material_id))(hit0)
u0 = jax.jit(lambda: uniforms(bounce_key(key, jnp.int32(1), jnp.int32(1)),
                              n, 8, lane=rays.pixel_index))()
jax.block_until_ready((hit0, mat0, u0))


def timeit(tag, fn, init):
    f = jax.jit(lambda c: jax.tree.map(
        lambda a: jnp.sum(a.astype(jnp.float32)) if a.ndim else a,
        jax.lax.fori_loop(0, REPS, lambda i, c: fn(c, i), init)))
    r = f(init)
    float(np.asarray(jax.tree.leaves(r)[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(init)
        float(np.asarray(jax.tree.leaves(r)[0]))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{tag:16s} {best*1e3:8.2f} ms ({best/n*1e9:6.1f} ns/ray)",
          flush=True)


timeit("raygen", lambda c, i: generate_rays(
    scene.camera, config, jax.random.fold_in(key, i), 8).origin, o)
timeit("geoms", lambda c, i: isect.intersect_geoms(c, d, geoms).point, o)
timeit("gather_mat", lambda c, i: bsdf.gather_materials(
    materials, hit0.material_id.astype(jnp.int32) + i * 0).color + c[:, :3] * 0.0, o)
timeit("uniforms", lambda c, i: c + uniforms(
    bounce_key(key, jnp.int32(1), i), n, 8, lane=rays.pixel_index)[:, :3],
    jnp.zeros((n, 3), jnp.float32))


def do_scatter(c, i):
    s = bsdf.scatter(c, d, rays.is_inside, hit0.point, hit0.normal, mat0,
                     u0, 0.0)
    return s.origin + s.direction * 1e-6


timeit("scatter", do_scatter, o)


def do_shade(c, i):
    col, nb = shade.shade(c, rays.remaining_bounces, hit0.t, mat0,
                          rays.sdepth, False)
    return col


timeit("shade", do_shade, jnp.ones((n, 3), jnp.float32))

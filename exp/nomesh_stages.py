"""Per-stage microbenchmark of the non-mesh bounce chain on TPU.

Times each stage of the bounce body in isolation (chained fori_loop,
scalar readback): raygen, analytic-geom intersect, material select,
RNG uniforms, BSDF scatter, shade. Sum should roughly match the
nomesh iteration cost (8 bounces + 1 raygen).
"""
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
REPS = 64
scene, n_tris, label = _mesh_scene(RES, None)
n = RES * RES
key = jax.random.PRNGKey(0)
cfg = RenderConfig(trace_depth=8, antialias=True)
geoms, materials, camera = scene.geoms, scene.materials, scene.camera

rays = generate_rays(camera, cfg, bounce_key(key, 1, 0), cfg.effective_depth)
hit = isect.intersect_geoms(rays.origin, rays.direction, geoms)
mat = bsdf.gather_materials(materials, hit.material_id)
u = uniforms(bounce_key(key, 1, 1), n, 8, lane=rays.pixel_index)
for x in jax.tree.leaves((rays, hit, mat, u)):
    x.block_until_ready() if hasattr(x, "block_until_ready") else None


def bench(tag, fn, *args):
    """Run fn REPS times chained on-device; report per-call ms."""
    @jax.jit
    def blk(*args):
        def body(i, c):
            # fold the counter in so the loop isn't hoisted
            out = fn(*args, c)
            return jax.tree.leaves(out)[0].reshape(-1)[:4].sum() + c * 0
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    r = blk(*args); float(np.asarray(r))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(blk(*args)))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{tag:16s} {best*1e3:7.3f} ms", flush=True)
    return best


t_raygen = bench("raygen", lambda c: generate_rays(
    camera, cfg, bounce_key(key, 1, 0), cfg.effective_depth,
    _salt=c if False else None) if False else generate_rays(
    camera, cfg, jax.random.fold_in(key, jnp.int32(c)), cfg.effective_depth))

t_geoms = bench("intersect_geoms", lambda c: isect.intersect_geoms(
    rays.origin + c * 0, rays.direction, geoms))

t_mat = bench("gather_mat", lambda c: bsdf.gather_materials(
    materials, hit.material_id + jnp.int32(c) * 0))

t_rng = bench("rng_uniforms", lambda c: uniforms(
    jax.random.fold_in(key, jnp.int32(c)), n, 8, lane=rays.pixel_index))

t_scatter = bench("bsdf_scatter", lambda c: bsdf.scatter(
    rays.origin + c * 0, rays.direction, rays.is_inside, hit.point,
    hit.normal, mat, u, cfg.softness))

t_shade = bench("shade", lambda c: shade.shade(
    rays.color + c * 0, rays.remaining_bounces, hit.t, mat, rays.sdepth,
    cfg.enable_sss))

per_bounce = t_geoms + t_mat + t_rng + t_scatter + t_shade
print(f"\nsum/bounce {per_bounce*1e3:7.3f} ms  -> iter ~ "
      f"{(t_raygen + 8 * per_bounce)*1e3:.1f} ms (+ wavefront glue)")

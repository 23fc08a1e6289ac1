"""Measure the CURRENT traversal on the real dragon.obj (headline config:
cornell + dragon, 800x800, depth 8)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    t0 = time.perf_counter()
    scene = load_scene(
        "/root/repo/scenes/cornell.txt",
        obj_path="/root/reference/scenes/dragon.obj",
    )
    res = int(os.environ.get("RES", "800"))
    iters = int(os.environ.get("ITERS", "5"))
    scene = with_resolution(scene, res, res)
    print(f"load+build: {time.perf_counter()-t0:.1f}s")
    kd = scene.kd
    print(f"tris={scene.mesh.v0.shape[0]} nodes={kd.nodes.count} "
          f"fat_rows={kd.fat.count} oct={'yes' if kd.oct is not None else 'no'} "
          f"depth={kd.max_depth}")

    depth = 8
    config = RenderConfig(trace_depth=depth, antialias=True, enable_kd=True)
    block = make_render_block_fn(scene, config, iters)
    n = res * res
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
    float(film[0, 0])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        film = jnp.zeros((n, 3), jnp.float32)
        t0 = time.perf_counter()
        film = block(film, key, jnp.int32(1 + iters))
        float(film[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    rays = n * depth
    print(f"ms/iter={best*1e3:.1f}  rays/s={rays/best/1e6:.2f}M")


if __name__ == "__main__":
    main()

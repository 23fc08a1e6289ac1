"""Sweep packet_size on the real dragon.obj on TPU."""
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

    scene = load_scene(
        "/root/repo/scenes/cornell.txt",
        obj_path=os.environ.get("OBJ", "/root/reference/scenes/dragon.obj"),
    )
    res = int(os.environ.get("RES", "800"))
    iters = int(os.environ.get("ITERS", "3"))
    depth = int(os.environ.get("DEPTH", "8"))
    scene = with_resolution(scene, res, res)
    kd = scene.kd
    print(f"tris={scene.mesh.v0.shape[0]} nodes={kd.nodes.count} "
          f"fat_rows={kd.fat.count} depth={kd.max_depth}", flush=True)

    n = res * res
    key = jax.random.PRNGKey(0)
    for P in [int(x) for x in os.environ.get("PS", "32,64,128,256").split(",")]:
        config = RenderConfig(trace_depth=depth, antialias=True, enable_kd=True,
                              packet_size=P)
        block = make_render_block_fn(scene, config, iters)
        t0 = time.perf_counter()
        film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
        float(film[0, 0])
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            film = jnp.zeros((n, 3), jnp.float32)
            t0 = time.perf_counter()
            film = block(film, key, jnp.int32(1 + iters))
            float(film[0, 0])
            best = min(best, (time.perf_counter() - t0) / iters)
        rays = n * depth
        print(f"P={P:4d} compile={tc:6.1f}s ms/iter={best*1e3:8.1f} "
              f"rays/s={rays/best/1e6:7.2f}M", flush=True)


if __name__ == "__main__":
    main()

"""Cluster-MXU intersector on the real dragon.obj on TPU: full-render
iteration time vs the KD walk, over (block, tile, rounds)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops.cluster import build_cluster_mesh
    from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    obj = os.environ.get("OBJ", "/root/reference/scenes/dragon.obj")
    res = int(os.environ.get("RES", "800"))
    iters = int(os.environ.get("ITERS", "3"))
    depth = int(os.environ.get("DEPTH", "8"))
    scene0 = load_scene("/root/repo/scenes/cornell.txt", obj_path=obj,
                        build_kd=os.environ.get("KD", "0") == "1",
                        build_cluster=False)
    scene0 = with_resolution(scene0, res, res)
    print(f"tris={scene0.mesh.v0.shape[0]}", flush=True)
    n = res * res
    key = jax.random.PRNGKey(0)

    def bench(scene, config, label):
        block = make_render_block_fn(scene, config, iters)
        t0 = time.perf_counter()
        film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
        m0 = float(jnp.mean(film))
        tc = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            film = jnp.zeros((n, 3), jnp.float32)
            t0 = time.perf_counter()
            film = block(film, key, jnp.int32(1 + iters))
            float(film[0, 0])
            best = min(best, (time.perf_counter() - t0) / iters)
        rays = n * depth
        print(f"{label}: compile={tc:6.1f}s ms/iter={best*1e3:8.1f} "
              f"rays/s={rays/best/1e6:7.2f}M mean={m0:.4f}", flush=True)

    cases = os.environ.get("CASES", "256:2048:12,256:2048:8,512:2048:8,256:4096:12")
    for case in cases.split(","):
        b, t, r = [int(x) for x in case.split(":")]
        cm = build_cluster_mesh(scene0.mesh, block=b)
        scene = scene0._replace(cmesh=cm)
        scan = os.environ.get("SCAN", "1") == "1"
        cfg = RenderConfig(trace_depth=depth, antialias=True, cluster=True,
                           cluster_tile=t, cluster_rounds=r,
                           scan_bounces=scan)
        bench(scene, cfg, f"cluster b={b} tile={t} R={r}")

    if os.environ.get("KD", "0") == "1":
        cfg = RenderConfig(trace_depth=depth, antialias=True, enable_kd=True,
                           scan_bounces=os.environ.get("SCAN", "1") == "1")
        bench(scene0, cfg, "kd fatrow")


if __name__ == "__main__":
    main()

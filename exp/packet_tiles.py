"""Focused: packet traversal through production traverse_fatrow — tile
policy x tree shape on dragon."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(np.asarray(out[0]).ravel()[0])
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from kdtreepathtraceroptimization_tpu.accel.kdtree import build_kdtree
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.traverse import traverse_fatrow
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    scene = load_scene("/root/repo/scenes/cornell.txt",
                       obj_path="/root/reference/scenes/dragon.obj")
    res = int(os.environ.get("RES", "400"))
    scene = with_resolution(scene, res, res)
    mesh = scene.mesh
    v0, v1, v2 = np.asarray(mesh.v0), np.asarray(mesh.v1), np.asarray(mesh.v2)

    rays = generate_rays(scene.camera, RenderConfig(),
                         bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    o_np, d_np = np.asarray(rays.origin), np.asarray(rays.direction)
    n = o_np.shape[0]
    rng = np.random.default_rng(0)
    nd = rng.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    hp = o_np + rng.uniform(2.0, 9.0, (n, 1)).astype(np.float32) * d_np
    t8 = jnp.full((n,), 12.0, jnp.float32)

    leafs = [int(x) for x in os.environ.get("LEAFS", "8,32").split(",")]
    ptl = [int(x) for x in os.environ.get("PTL", "0,65536,10240").split(",")]
    P = int(os.environ.get("P", "64"))

    for leaf_size in leafs:
        kd = build_kdtree(v0, v1, v2, leaf_size=leaf_size,
                          max_depth=24 if leaf_size >= 8 else 30,
                          inline_cap=max(8, leaf_size))
        print(f"leaf={leaf_size}: nodes={kd.nodes.count} rows={kd.fat.count} "
              f"cap={kd.fat.inline_cap} depth={kd.max_depth}", flush=True)
        for lanes in ptl:
            cfg = RenderConfig(packet_size=P, packet_tile_lanes=lanes)
            for label, (o, d) in [("primary", (o_np, d_np)), ("bounce", (hp, nd))]:
                f = jax.jit(lambda o, d, t, cfg=cfg: traverse_fatrow(
                    jnp.asarray(o), jnp.asarray(d), kd, cfg, t_init=t))
                dt = timeit(f, jnp.asarray(o), jnp.asarray(d), t8)
                print(f"  P={P} ptl={lanes:6d} {label:8s}: {dt*1e3:8.1f} ms "
                      f"{dt/n*1e9:7.1f} ns/ray", flush=True)


if __name__ == "__main__":
    main()

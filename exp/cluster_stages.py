"""Break down cluster-intersector cost on dragon: cull / main pass /
flag rate / repair, for primary and bounce-like wavefronts."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax = sys.modules["jax"]
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops import cluster as cl
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    res = int(os.environ.get("RES", "800"))
    block = int(os.environ.get("B", "128"))
    tile = int(os.environ.get("TILE", "1024"))
    rounds = int(os.environ.get("R", "16"))
    scene = load_scene("/root/repo/scenes/cornell.txt",
                       obj_path=os.environ.get("OBJ", "/root/reference/scenes/dragon.obj"),
                       build_kd=False, build_cluster=False)
    scene = with_resolution(scene, res, res)
    cm = cl.build_cluster_mesh(scene.mesh, block=block)
    k = cm.n_blocks
    print(f"tris={scene.mesh.v0.shape[0]} K={k} block={block} tile={tile} R={rounds}",
          flush=True)

    rays = generate_rays(scene.camera, RenderConfig(),
                         bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    n = rays.origin.shape[0]
    # bounce-like: origins on scene surfaces, random directions
    rng = np.random.default_rng(0)
    o_np = np.asarray(rays.origin)
    d_np = np.asarray(rays.direction)
    hp = o_np + rng.uniform(2.0, 9.0, (n, 1)).astype(np.float32) * d_np
    nd = rng.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)

    t_wall = jnp.full((n,), 11.0, jnp.float32)  # analytic-bound stand-in
    act = jnp.ones((n,), bool)

    cfg = RenderConfig(cluster_tile=tile, cluster_rounds=rounds)

    cull = jax.jit(lambda o, d, t: cl._cull(
        jnp.asarray(o) - cm.center_shift, jnp.asarray(d), cm, t, act, tile, rounds))

    def main_pass(o, d, t):
        o = jnp.asarray(o) - cm.center_shift
        d = jnp.asarray(d)
        sel, lb, dropped = cl._cull(o, d, cm, t, act, tile, rounds)
        r = cl.mxu_bf.ray_features(o, d)
        r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)
        bt, btri = cl._cluster_pallas(sel, lb, r, t, act.astype(jnp.float32),
                                      cm.w, tile, block, rounds, False)
        flag = act & (dropped < bt)
        return bt, btri, flag

    def sweep(o, d, t):
        o = jnp.asarray(o) - cm.center_shift
        d = jnp.asarray(d)
        r = cl.mxu_bf.ray_features(o, d)
        r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)
        return cl._sweep_pallas(r, t, cm.w, tile, block, False)

    for label, (o, d) in [("primary", (o_np, d_np)), ("bounce", (hp, nd))]:
        dt, _ = timeit(cull, o, d, t_wall)
        print(f"{label}: cull            {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray)",
              flush=True)
        f = jax.jit(main_pass)
        dt, out = timeit(f, o, d, t_wall)
        flag = np.asarray(out[2])
        hits = np.asarray(out[0]) < 11.0
        print(f"{label}: cull+main       {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray) "
              f"flag_rate={flag.mean():.4f} hit_rate={hits.mean():.4f}", flush=True)
        fs = jax.jit(sweep)
        dt, _ = timeit(fs, o, d, t_wall)
        print(f"{label}: full sweep      {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray)",
              flush=True)


if __name__ == "__main__":
    main()

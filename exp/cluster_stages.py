"""Break down cluster-intersector cost on dragon: sort / cull / select /
main kernel / flag rate / sweep, for primary and bounce-like wavefronts.
Matches the round-2 rewrite of ops/cluster.py."""
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
    from kdtreepathtraceroptimization_tpu.ops.traverse import _coherence_key
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    res = int(os.environ.get("RES", "800"))
    block = int(os.environ.get("B", "256"))
    tile = int(os.environ.get("TILE", "1024"))
    rounds = int(os.environ.get("R", "64"))
    scene = load_scene("/root/repo/scenes/cornell.txt",
                       obj_path=os.environ.get("OBJ", "/root/reference/scenes/dragon.obj"),
                       build_kd=False, build_cluster=False)
    scene = with_resolution(scene, res, res)
    cm = cl.build_cluster_mesh(scene.mesh, block=block)
    kp = cm.n_blocks
    print(f"tris={scene.mesh.v0.shape[0]} K={cm.n_real_blocks}/{kp} "
          f"block={block} tile={tile} R={rounds}", flush=True)

    rays = generate_rays(scene.camera, RenderConfig(),
                         bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    n = rays.origin.shape[0]
    rng = np.random.default_rng(0)
    o_np = np.asarray(rays.origin)
    d_np = np.asarray(rays.direction)
    hp = o_np + rng.uniform(2.0, 9.0, (n, 1)).astype(np.float32) * d_np
    nd = rng.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)

    t_wall = jnp.full((n,), 11.0, jnp.float32)
    act = jnp.ones((n,), bool)
    lane = jnp.arange(n, dtype=jnp.int32)

    def sort_fn(o, d, t0):
        o = jnp.asarray(o) - cm.center_shift
        d = jnp.asarray(d)
        ckey = _coherence_key(o, d, act, cm.root_min, cm.root_max)
        out = jax.lax.sort(
            (ckey, lane, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2], t0, act.astype(jnp.int32)),
            num_keys=1)
        return out[1]

    def packx(o, d, t0):
        o = jnp.asarray(o) - cm.center_shift
        d = jnp.asarray(d)
        return jnp.concatenate(
            [o, d, t0[:, None], jnp.ones((n, 1), jnp.float32)], axis=1)

    def cull_fn(o, d, t0):
        return cl._cull_pallas(packx(o, d, t0), cm.cull_w, cm.blk, tile, False)

    def sel_fn(o, d, t0):
        te = cl._cull_pallas(packx(o, d, t0), cm.cull_w, cm.blk, tile, False)
        return cl._select(te, rounds)

    def main_fn(o, d, t0):
        x = packx(o, d, t0)
        te = cl._cull_pallas(x, cm.cull_w, cm.blk, tile, False)
        sel, lb, lb_over = cl._select(te, rounds)
        r = cl.mxu_bf.ray_features(x[:, 0:3], x[:, 3:6])
        r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)
        bt, btri = cl._cluster_pallas(sel, lb, r, t0, x[:, 7], cm.w,
                                      tile, block, sel.shape[1], False)
        flag = act & (jnp.repeat(lb_over, tile) < bt)
        return bt, btri, flag, te

    def sweep_fn(o, d, t0):
        x = packx(o, d, t0)
        r = cl.mxu_bf.ray_features(x[:, 0:3], x[:, 3:6])
        r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)
        return cl._sweep_pallas(r, t0, cm.w, tile, block, False)

    for label, (o, d) in [("primary", (o_np, d_np)), ("bounce", (hp, nd))]:
        dt, _ = timeit(jax.jit(sort_fn), o, d, t_wall)
        print(f"{label}: sort          {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray)", flush=True)
        dt, te = timeit(jax.jit(cull_fn), o, d, t_wall)
        feas = (np.asarray(te) < 1e30).sum(1)
        print(f"{label}: cull          {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray) "
              f"tile-feasible mean={feas.mean():.1f} p95={np.percentile(feas,95):.0f} "
              f"max={feas.max()}", flush=True)
        dt, _ = timeit(jax.jit(sel_fn), o, d, t_wall)
        print(f"{label}: cull+select   {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray)", flush=True)
        dt, out = timeit(jax.jit(main_fn), o, d, t_wall)
        flag = np.asarray(out[2])
        hits = np.asarray(out[0]) < 11.0
        print(f"{label}: +main kernel  {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray) "
              f"flag_rate={flag.mean():.5f} hit_rate={hits.mean():.4f}", flush=True)
        dt, _ = timeit(jax.jit(sweep_fn), o, d, t_wall)
        print(f"{label}: full sweep    {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray)", flush=True)

        # sorted variant of main
        def main_sorted(o, d, t0):
            idx = sort_fn(o, d, t0)
            o2 = jnp.asarray(o)[idx]
            d2 = jnp.asarray(d)[idx]
            return main_fn(o2, d2, t0)

        dt, out = timeit(jax.jit(main_sorted), o, d, t_wall)
        flag = np.asarray(out[2])
        te = np.asarray(out[3])
        feas = (te < 1e30).sum(1)
        print(f"{label}: sorted main   {dt*1e3:8.2f} ms ({dt/n*1e9:6.1f} ns/ray) "
              f"flag_rate={flag.mean():.5f} tile-feas mean={feas.mean():.1f} "
              f"p95={np.percentile(feas,95):.0f}", flush=True)


if __name__ == "__main__":
    main()

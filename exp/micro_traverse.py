"""Traversal-only microbench on dragon.obj: per-ray vs packet walks,
primary vs bounce rays, with step counting (instrumented copies of the
production loops)."""
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
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops import intersect as isect
    from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.traverse import (
        _mt_inline, _mt_inline_packet, _coherence_key,
    )
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    scene = load_scene(
        "/root/repo/scenes/cornell.txt",
        obj_path=os.environ.get("OBJ", "/root/reference/scenes/dragon.obj"),
    )
    res = int(os.environ.get("RES", "400"))
    scene = with_resolution(scene, res, res)
    kd = scene.kd
    rows_np = kd.fat.rows
    n_rows = kd.fat.count
    cap = kd.fat.inline_cap
    print(f"rows={n_rows} cap={cap} depth={kd.max_depth}", flush=True)

    cfg = RenderConfig()
    rays = generate_rays(scene.camera, cfg, bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    o_np, d_np = np.asarray(rays.origin), np.asarray(rays.direction)
    n = o_np.shape[0]

    # bounce-like rays: hit points of primary rays + random cosine dirs
    # around the (approx) normal — crude but representative incoherence.
    key = jax.random.PRNGKey(1)
    t_prim = None

    MAXS = 4096

    def walk_per_ray(o, d, rows_dev, t0):
        def cond(s):
            cur, bt, btri, steps, live = s
            return jnp.logical_and(jnp.any(cur < n_rows), steps < MAXS)

        def body(s):
            cur, bt, btri, steps, live = s
            lane_on = cur < n_rows
            cur_c = jnp.clip(cur, 0, n_rows - 1)
            row = rows_dev[cur_c]
            axis = row[:, 0]
            bmin, bmax = row[:, 1:4], row[:, 4:7]
            skip = row[:, 7].astype(jnp.int32)
            nxt_link = row[:, 8].astype(jnp.int32)
            tri_base = row[:, 10].astype(jnp.int32)
            inline_n = row[:, 11].astype(jnp.int32)
            hit_box, dist = isect.intersect_aabb(o, d, bmin, bmax)
            pruned = ~hit_box | (dist > bt)
            is_leaf = axis < 0
            do_leaf = lane_on & is_leaf & ~pruned
            bt, btri = _mt_inline(o, d, row[:, 12:], inline_n, tri_base, do_leaf, bt, btri)
            leaf_next = jnp.where(nxt_link >= 0, nxt_link, skip)
            nxt = jnp.where(pruned, skip, jnp.where(is_leaf, leaf_next, nxt_link))
            return (jnp.where(lane_on, nxt, cur), bt, btri, steps + 1,
                    live + lane_on.astype(jnp.int32))

        st = (jnp.zeros((o.shape[0],), jnp.int32), t0,
              jnp.full((o.shape[0],), -1, jnp.int32), jnp.int32(0),
              jnp.zeros((o.shape[0],), jnp.int32))
        cur, bt, btri, steps, live = jax.lax.while_loop(cond, body, st)
        return bt, btri, live

    def walk_packet(o, d, rows_dev, t0, P, k):
        npk = o.shape[0] // P
        o3 = o.reshape(npk, P, 3)
        d3 = d.reshape(npk, P, 3)
        bt = t0.reshape(npk, P)
        pk = jnp.arange(npk)

        def cond(s):
            cur, sp, stack, bt, btri, steps, live = s
            return jnp.logical_and(jnp.any((cur >= 0) | (sp > 0)), steps < MAXS)

        def body(s):
            cur, sp, stack, bt, btri, steps, live = s
            need_pop = (cur < 0) & (sp > 0)
            sp_idx = jnp.clip(sp - 1, 0, k - 1)
            cur = jnp.where(need_pop, stack[pk, sp_idx], cur)
            sp = jnp.where(need_pop, sp - 1, sp)
            pk_on = cur >= 0
            cur_c = jnp.clip(cur, 0, n_rows - 1)
            row = rows_dev[cur_c]
            axis = row[:, 0]
            bmin, bmax = row[:, None, 1:4], row[:, None, 4:7]
            left = row[:, 8].astype(jnp.int32)
            right = row[:, 9].astype(jnp.int32)
            tri_base = row[:, 10].astype(jnp.int32)
            inline_n = row[:, 11].astype(jnp.int32)
            hit_box, dist = isect.intersect_aabb(o3, d3, bmin, bmax)
            want = hit_box & (dist <= bt)
            enter = pk_on & jnp.any(want, axis=1)
            is_leaf = axis < 0
            do_leaf = enter & is_leaf
            bt, btri = _mt_inline_packet(
                o3, d3, row[:, 12:], inline_n, tri_base, do_leaf,
                jnp.ones((npk, P), bool), bt, btri)
            ax_c = jnp.clip(axis.astype(jnp.int32), 0, 2)
            d_ax = jnp.take_along_axis(d3, ax_c[:, None, None], axis=2)[:, :, 0]
            vote = jnp.sum(jnp.sign(d_ax), axis=1)
            near = jnp.where(vote >= 0, left, right)
            far = jnp.where(vote >= 0, right, left)
            descend_to = jnp.where(near >= 0, near, far)
            push_far = enter & ~is_leaf & (near >= 0) & (far >= 0)
            sp_push = jnp.clip(sp, 0, k - 1)
            stack = stack.at[pk, sp_push].set(jnp.where(push_far, far, stack[pk, sp_push]))
            sp = jnp.where(push_far & (sp < k), sp + 1, sp)
            nxt = jnp.where(~enter, -1, jnp.where(is_leaf, left, descend_to))
            cur = jnp.where(pk_on, nxt, cur)
            return (cur, sp, stack, bt, btri, steps + 1, live + pk_on.astype(jnp.int32))

        st = (jnp.zeros((npk,), jnp.int32), jnp.zeros((npk,), jnp.int32),
              jnp.full((npk, k), -1, jnp.int32), bt,
              jnp.full((npk, P), -1, jnp.int32), jnp.int32(0),
              jnp.zeros((npk,), jnp.int32))
        cur, sp, stack, bt, btri, steps, live = jax.lax.while_loop(cond, body, st)
        return bt.reshape(-1), btri.reshape(-1), live

    rows_dev = jnp.asarray(rows_np)
    k = max(2, kd.max_depth + 2)

    def run_case(o_np, d_np, label, sortkey="octmorton"):
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        t0v = jnp.full((n,), BIG, jnp.float32)
        # coherence sort
        keyv = None
        if sortkey == "octmorton":
            keyv = _coherence_key(o, d, jnp.ones((n,), bool),
                                  jnp.asarray(kd.root_bbox_min), jnp.asarray(kd.root_bbox_max))
        elif sortkey == "dirfine":
            octant = ((d_np[:, 0] >= 0) + 2 * (d_np[:, 1] >= 0) + 4 * (d_np[:, 2] >= 0)).astype(np.int64)
            span = np.maximum(kd.root_bbox_max - kd.root_bbox_min, 1e-6)
            q = np.clip((o_np - kd.root_bbox_min) / span * 15, 0, 15).astype(np.int64)
            morton = np.zeros(n, np.int64)
            for b in range(4):
                for a in range(3):
                    morton |= ((q[:, a] >> b) & 1) << (3 * b + a)
            # fine direction: quantized d components 3 bits each
            qd = np.clip((d_np * 0.5 + 0.5) * 7, 0, 7).astype(np.int64)
            dirf = (qd[:, 0] << 6) | (qd[:, 1] << 3) | qd[:, 2]
            keyv = jnp.asarray(((octant << 33) | (morton << 21) | (dirf << 12) | morton).astype(np.int32))
            keyv = jnp.asarray(((octant << 21) | (dirf << 12) | morton).astype(np.int32))
        if keyv is not None:
            order = jnp.argsort(keyv)
            o, d = o[order], d[order]

        f1 = jax.jit(lambda o, d, t: walk_per_ray(o, d, rows_dev, t))
        dt, out = timeit(f1, o, d, t0v)
        live = np.asarray(out[2])
        print(f"{label:24s} per-ray : {dt*1e3:8.1f} ms  {dt/n*1e9:7.1f} ns/ray  "
              f"steps mean={live.mean():7.1f} p99={np.percentile(live,99):7.0f}", flush=True)
        for P in [16, 32, 64, 128]:
            fP = jax.jit(lambda o, d, t, P=P: walk_packet(o, d, rows_dev, t, P, k))
            dt, out = timeit(fP, o, d, t0v)
            live = np.asarray(out[2])
            print(f"{label:24s} P={P:4d}  : {dt*1e3:8.1f} ms  {dt/n*1e9:7.1f} ns/ray  "
                  f"pk-steps mean={live.mean():7.1f} p99={np.percentile(live,99):7.0f}", flush=True)

    run_case(o_np, d_np, "primary/octmorton")

    # build bounce rays: reflect primary at first hit with random cosine dirs
    f1 = jax.jit(lambda o, d, t: walk_per_ray(o, d, rows_dev, t))
    _, out = timeit(f1, jnp.asarray(o_np), jnp.asarray(d_np), jnp.full((n,), BIG, jnp.float32))
    bt = np.asarray(out[0])
    hitm = bt < BIG * 0.5
    hp = o_np + bt[:, None] * d_np * 0.999
    rng = np.random.default_rng(0)
    nd = rng.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    # push origins of misses to box walls
    hp[~hitm] = o_np[~hitm] + 8.0 * d_np[~hitm]
    run_case(hp, nd, "bounce/octmorton")
    run_case(hp, nd, "bounce/dirfine", sortkey="dirfine")


if __name__ == "__main__" and os.environ.get("MODE", "base") == "base":
    main()


def tree_shape_sweep():
    """Variant: rebuild the dragon tree with different leaf sizes/caps."""
    import jax
    import jax.numpy as jnp
    from kdtreepathtraceroptimization_tpu.accel.kdtree import build_kdtree
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.traverse import traverse_fatrow
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
    from kdtreepathtraceroptimization_tpu.scene.obj_loader import load_obj

    scene = load_scene(
        "/root/repo/scenes/cornell.txt",
        obj_path=os.environ.get("OBJ", "/root/reference/scenes/dragon.obj"),
    )
    res = int(os.environ.get("RES", "400"))
    scene = with_resolution(scene, res, res)
    mesh = scene.mesh
    v0, v1, v2 = np.asarray(mesh.v0), np.asarray(mesh.v1), np.asarray(mesh.v2)

    cfgP = RenderConfig()
    rays = generate_rays(scene.camera, cfgP, bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    o_np, d_np = np.asarray(rays.origin), np.asarray(rays.direction)
    n = o_np.shape[0]
    rng = np.random.default_rng(0)
    nd = rng.normal(size=(n, 3)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)

    t8 = jnp.full((n,), 12.0, jnp.float32)  # analytic-prune stand-in (box scale)

    for leaf_size, maxd in [(8, 24), (8, 30), (16, 24), (4, 30)]:
        import time as _t
        tb0 = _t.perf_counter()
        kd = build_kdtree(v0, v1, v2, leaf_size=leaf_size, max_depth=maxd,
                          inline_cap=max(8, leaf_size))
        tb = _t.perf_counter() - tb0
        print(f"leaf={leaf_size} maxd={maxd}: nodes={kd.nodes.count} rows={kd.fat.count} "
              f"cap={kd.fat.inline_cap} depth={kd.max_depth} build={tb:.1f}s", flush=True)
        # bounce hit points from primary trace (approx: reuse same as before
        # is annoying; just use box-scaled random origins near the dragon)
        hp = o_np + rng.uniform(2.0, 9.0, (n, 1)).astype(np.float32) * d_np
        for label, (o, d) in [("primary", (o_np, d_np)), ("bounce", (hp, nd))]:
            for P in [0, 32, 64]:
                cfg = RenderConfig(packet_size=P)
                f = jax.jit(lambda o, d, t, cfg=cfg: traverse_fatrow(
                    jnp.asarray(o), jnp.asarray(d), kd, cfg, t_init=t))
                try:
                    dt, _ = timeit(f, o, d, t8)
                    print(f"  {label:8s} P={P:3d}: {dt*1e3:8.1f} ms  {dt/n*1e9:7.1f} ns/ray", flush=True)
                except Exception as e:
                    print(f"  {label:8s} P={P:3d}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__" and os.environ.get("MODE") == "shape":
    tree_shape_sweep()

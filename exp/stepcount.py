"""CPU simulation: fat-row traversal step counts on cornell+dragon.

Replicates the device lockstep walk in numpy (compressing inactive
lanes, which XLA cannot) and records PER-RAY step counts — the direct
driver of TPU cost (one row gather per step). Reports per-ray
mean/percentiles, internal-vs-leaf composition, and per-tile lockstep
maxima (what the while_loop actually pays) after octant sorting.

Variants:
  static    — pre-order skip-link walk, no ordering (default past the
              octant-table cap)
  nearfirst — short-stack walk, children ordered by direction sign,
              t-pruned (pathtrace.cu:1104-1112 / VERDICT item 6)
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays


def mt_min(o, d, v0, v1, v2):
    """[k, c] Möller–Trumbore min-t per lane (numpy)."""
    e1, e2 = v1 - v0, v2 - v0
    p = np.cross(d[:, None, :], e2)
    a = np.einsum('kcj,kcj->kc', e1, p)
    ok = a > 1.19e-7
    f = 1.0 / np.where(ok, a, 1.0)
    s = o[:, None, :] - v0
    u = f * np.einsum('kcj,kcj->kc', s, p)
    q = np.cross(s, e1)
    v = f * np.einsum('kcj,kcj->kc', d[:, None, :], q)
    t = f * np.einsum('kcj,kcj->kc', e2, q)
    ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= 0)
    return np.where(ok, t, np.inf).min(axis=1)


def walk(o, d, kd, order):
    nodes, tris = kd.nodes, kd.tris
    cap = kd.fat.inline_cap
    n = o.shape[0]
    m = nodes.count
    axis, bmin, bmax = nodes.axis, nodes.bbox_min, nodes.bbox_max
    left, right, skip = nodes.left, nodes.right, nodes.skip
    tstart, tcount = nodes.tri_start, nodes.tri_count

    steps = np.zeros(n, np.int64)
    internal = np.zeros(n, np.int64)
    leafrow = np.zeros(n, np.int64)
    bt = np.full(n, np.inf, np.float32)

    K = kd.max_depth + 2
    if order == "static":
        cur = np.zeros(n, np.int64)
        done = np.zeros(n, bool)
    else:
        stack = np.full((n, K), -1, np.int64)
        sp = np.ones(n, np.int64)
        stack[:, 0] = 0
        cur = np.full(n, -1, np.int64)
        done = np.zeros(n, bool)

    it = 0
    while not done.all():
        it += 1
        if order == "nearfirst":
            need = (cur < 0) & (sp > 0)
            cur[need] = stack[np.where(need)[0], sp[need] - 1]
            sp[need] -= 1
            done = (cur < 0) & (sp == 0)
            act = cur >= 0
        else:
            act = cur < m
            done = ~act
        ids = np.where(act)[0]
        if ids.size == 0:
            break
        c = cur[ids]
        steps[ids] += 1
        bmn, bmx, ax = bmin[c], bmax[c], axis[c]
        oi, di = o[ids], d[ids]
        inv = 1.0 / np.where(np.abs(di) > 1e-12, di, 1e-12)
        t0 = (bmn - oi) * inv
        t1 = (bmx - oi) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = tmax >= np.maximum(tmin, 0.0)
        pruned = ~hit | (np.maximum(tmin, 0.0) > bt[ids])

        is_leaf = ax < 0
        do_leaf = is_leaf & ~pruned
        if do_leaf.any():
            li = ids[do_leaf]
            s0, cnt = tstart[cur[li]], tcount[cur[li]]
            rows_extra = np.maximum((cnt + cap - 1) // cap, 1) - 1
            leafrow[li] += rows_extra
            steps[li] += rows_extra
            cmax = int(cnt.max()) if cnt.size else 0
            if cmax:
                offs = np.arange(cmax)
                idx = np.minimum(s0[:, None] + offs[None, :], tris.v0.shape[0] - 1)
                valid = offs[None, :] < cnt[:, None]
                tmin_tri = mt_min(o[li], d[li],
                                  np.where(valid[..., None], tris.v0[idx], 0),
                                  np.where(valid[..., None], tris.v1[idx], 0),
                                  np.where(valid[..., None], tris.v2[idx], 0))
                bt[li] = np.minimum(bt[li], tmin_tri)
        internal[ids[~is_leaf & ~pruned]] += 1

        if order == "static":
            nxt = np.where(pruned | is_leaf, skip[c], c + 1)
            cur[ids] = nxt
        else:
            dax = np.take_along_axis(di, np.maximum(ax, 0)[:, None], axis=1)[:, 0]
            near = np.where(dax >= 0, left[c], right[c])
            far = np.where(dax >= 0, right[c], left[c])
            desc = np.where(near >= 0, near, far)
            push = ~is_leaf & ~pruned & (near >= 0) & (far >= 0)
            pi = ids[push]
            stack[pi, sp[pi]] = far[push]
            sp[pi] += 1
            nxt = np.where(pruned | is_leaf, -1, desc)
            cur[ids] = nxt
    return steps, internal, leafrow, bt


def main():
    leaves = [int(x) for x in (sys.argv[1].split(',') if len(sys.argv) > 1 else [32, 64])]
    RES = 400
    import jax
    for leaf in leaves:
        scene = load_scene('scenes/cornell.txt',
                           obj_path='/root/reference/scenes/dragon.obj',
                           mtl_dir='/root/reference/scenes', leaf_size=leaf)
        scene = with_resolution(scene, RES, RES)
        kd = scene.kd
        rays = generate_rays(scene.camera, RenderConfig(antialias=False),
                             jax.random.PRNGKey(0), 8)
        o = np.asarray(rays.origin).astype(np.float64)
        d = np.asarray(rays.direction).astype(np.float64)
        sel = np.random.RandomState(0).permutation(o.shape[0])[:16384]
        sel.sort()
        o, d = o[sel], d[sel]
        for order in ("static", "nearfirst"):
            st, it_, lf, bt = walk(o, d, kd, order)
            octant = ((d[:, 0] >= 0) + 2 * (d[:, 1] >= 0) + 4 * (d[:, 2] >= 0)).astype(int)
            idx = np.argsort(octant, kind='stable')
            ss = st[idx]
            out = {'leaf': leaf, 'order': order,
                   'mean': round(float(st.mean()), 1),
                   'p50': int(np.percentile(st, 50)),
                   'p95': int(np.percentile(st, 95)),
                   'p99': int(np.percentile(st, 99)),
                   'max': int(st.max()),
                   'internal': round(float(it_.mean()), 1),
                   'leafrows_extra': round(float(lf.mean()), 1),
                   'hit_frac': round(float(np.isfinite(bt).mean()), 3)}
            for tile in (2048, 10240):
                k = len(ss) // tile * tile
                tmax = ss[:k].reshape(-1, tile).max(axis=1)
                out[f'tilemax{tile}'] = round(float(tmax.mean()), 1)
            print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()

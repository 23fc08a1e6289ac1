"""Feasible-block statistics on cornell+dragon: per-ray vs per-tile-union
counts, pixel order vs coherence-sorted, for primary and diffuse-bounce
wavefronts. Pure numpy (chunked) — no TPU needed. Drives the round-3
intersector design: per-tile union count ~= MXU rounds per tile.

Also simulates the entry-ordered early exit per tile: rounds actually
walked = max over rays in tile of rank-of-winning-block (needs MT tests,
so done on sampled tiles).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

RES = int(os.environ.get("RES", "800"))
BLOCK = int(os.environ.get("B", "256"))


def load():
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
    scene = load_scene("/root/repo/scenes/cornell.txt",
                       obj_path="/root/reference/scenes/dragon.obj",
                       build_kd=False, build_cluster=False)
    return with_resolution(scene, RES, RES)


def block_bounds(mesh, block):
    from kdtreepathtraceroptimization_tpu.ops.cluster import _morton3
    v0 = np.asarray(mesh.v0, np.float32)
    v1 = np.asarray(mesh.v1, np.float32)
    v2 = np.asarray(mesh.v2, np.float32)
    cent = (v0 + v1 + v2) / 3.0
    order = np.argsort(_morton3(cent), kind="stable")
    t = v0.shape[0]
    pad = (-t) % block
    idx = np.concatenate([order, np.full(pad, order[-1], np.int64)])
    b0 = v0[idx].reshape(-1, block, 3)
    b1 = v1[idx].reshape(-1, block, 3)
    b2 = v2[idx].reshape(-1, block, 3)
    lo = np.minimum(b0.min(1), np.minimum(b1.min(1), b2.min(1)))
    hi = np.maximum(b0.max(1), np.maximum(b1.max(1), b2.max(1)))
    c = 0.5 * (lo + hi)
    r = 0.5 * np.linalg.norm(hi - lo, axis=1) + 1e-5
    return c, r, lo, hi, (b0, b1, b2), idx


def sphere_entry(o, d, t0, c, r):
    """[n,3],[n,3],[n] vs [k,3],[k] -> entry [n,k] (inf infeasible)."""
    oc = o[:, None, :] - c[None, :, :]           # [n,k,3]
    t_ca = -np.einsum("nkc,nc->nk", oc, d)
    d2 = np.einsum("nkc,nkc->nk", oc, oc) - t_ca * t_ca
    entry = np.maximum(t_ca - r[None, :], 0.0)
    feas = (d2 <= (r * r)[None, :]) & (t_ca + r[None, :] > 0) & (entry < t0[:, None])
    return np.where(feas, entry, np.inf)


def aabb_entry(o, d, t0, lo, hi):
    """Slab test [n,k]: tighter than spheres for Morton blocks."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t1 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t2 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tmin = np.minimum(t1, t2).max(2)
    tmax = np.maximum(t1, t2).min(2)
    feas = (tmax >= np.maximum(tmin, 0.0)) & (tmin < t0[:, None])
    return np.where(feas, np.maximum(tmin, 0.0), np.inf)


def analytic_t0(scene, o, d):
    from kdtreepathtraceroptimization_tpu.ops import intersect as isect
    import jax.numpy as jnp
    hit = isect.intersect_geoms(jnp.asarray(o), jnp.asarray(d), scene.geoms)
    return np.asarray(hit.t), np.asarray(hit.point), np.asarray(hit.normal)


def stats(name, o, d, t0, c, r, lo, hi, tiles=(128, 256, 1024)):
    n = o.shape[0]
    per_ray_s = np.zeros(n, np.int32)
    per_ray_a = np.zeros(n, np.int32)
    feas_s = None
    chunk = 65536
    per_tile = {ts: [] for ts in tiles}
    per_tile_a = {ts: [] for ts in tiles}
    for i in range(0, n, chunk):
        sl = slice(i, min(i + chunk, n))
        es = sphere_entry(o[sl], d[sl], t0[sl], c, r)
        ea = aabb_entry(o[sl], d[sl], t0[sl], lo, hi)
        ea = np.where(np.isinf(es), np.inf, ea)  # sphere & aabb both
        fs = np.isfinite(es)
        fa = np.isfinite(ea)
        per_ray_s[sl] = fs.sum(1)
        per_ray_a[sl] = fa.sum(1)
        for ts in tiles:
            m = fs.shape[0] // ts * ts
            per_tile[ts].append(
                fs[:m].reshape(-1, ts, fs.shape[1]).any(1).sum(1))
            per_tile_a[ts].append(
                fa[:m].reshape(-1, ts, fa.shape[1]).any(1).sum(1))
    print(f"--- {name} (K={c.shape[0]}) ---")
    print(f"  per-ray  sphere: mean={per_ray_s.mean():6.1f} p95={np.percentile(per_ray_s,95):5.0f}  "
          f"aabb&s: mean={per_ray_a.mean():6.1f} p95={np.percentile(per_ray_a,95):5.0f}")
    for ts in tiles:
        u = np.concatenate(per_tile[ts]); ua = np.concatenate(per_tile_a[ts])
        print(f"  tile{ts:5d} union sphere: mean={u.mean():6.1f} p95={np.percentile(u,95):5.0f}  "
              f"aabb&s: mean={ua.mean():6.1f} p95={np.percentile(ua,95):5.0f}")
    return per_ray_a


def main():
    scene = load()
    c, r, lo, hi, blocks, idx = block_bounds(scene.mesh, BLOCK)
    import jax
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    rays = generate_rays(scene.camera, RenderConfig(),
                         bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    o = np.asarray(rays.origin); d = np.asarray(rays.direction)
    t0, hitp, hitn = analytic_t0(scene, o, d)
    t0c = np.minimum(t0, 1e4)

    stats("primary (pixel order)", o, d, t0c, c, r, lo, hi)

    # Diffuse bounce: origins = analytic wall hits, cosine hemisphere dirs.
    rng = np.random.default_rng(1)
    u1 = rng.random(o.shape[0]).astype(np.float32)
    u2 = rng.random(o.shape[0]).astype(np.float32)
    st = np.sqrt(u1)
    phi = 2 * np.pi * u2
    # build tangent basis around hitn
    a = np.where(np.abs(hitn[:, 0:1]) > 0.9, [0, 1, 0], [1, 0, 0]).astype(np.float32)
    t1v = np.cross(hitn, a); t1v /= np.linalg.norm(t1v, axis=1, keepdims=True) + 1e-12
    t2v = np.cross(hitn, t1v)
    nd = (np.sqrt(np.maximum(0, 1 - u1))[:, None] * hitn
          + (st * np.cos(phi))[:, None] * t1v + (st * np.sin(phi))[:, None] * t2v)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True) + 1e-12
    no = hitp + 1e-4 * hitn
    nt0, _, _ = analytic_t0(scene, no, nd)
    nt0 = np.minimum(nt0, 1e4)
    pr = stats("diffuse bounce (pixel order)", no, nd, nt0, c, r, lo, hi)

    # Sorted order (octant + origin morton), same wavefront
    from kdtreepathtraceroptimization_tpu.ops.cluster import _morton3
    oct_ = ((nd[:, 0] > 0) * 4 + (nd[:, 1] > 0) * 2 + (nd[:, 2] > 0)).astype(np.uint64)
    m = _morton3(no)
    key = (oct_ << np.uint64(63 - 3)) | (m >> np.uint64(3))
    srt = np.argsort(key, kind="stable")
    stats("diffuse bounce (sorted)", no[srt], nd[srt], nt0[srt], c, r, lo, hi)


if __name__ == "__main__":
    main()

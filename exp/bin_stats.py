"""Simulate round-3 binning strategies on cornell+dragon (pure numpy).

The round-2 cluster path sorts rays by (octant | origin-morton) and gets
tile-256 unions of 80-119 feasible blocks — 20-30x over the MXU budget.
Question: if rays are instead binned by their ARGMIN-ENTRY block id
(computable per-ray by the cull kernel without materializing [N, K]),
how small do tile unions get, and how deep does the entry-ordered early
exit actually walk?

For each ordering we report, at several tile sizes:
  union      : mean/p95 of |union of feasible blocks| per tile
               (= MXU rounds per tile with NO early exit)
  ee-rounds  : mean/p95 of the tile's early-exit depth = max over rays
               of  #{feasible blocks of the TILE with entry < ray's
               true hit t}  (entry-ordered walk stops for a ray once
               its best t <= next entry; the tile stops when all stop)

True hit t is computed by exact MT against the ray's own feasible
blocks (chunked numpy).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from union_stats_lib import (  # noqa: E402
    load, block_bounds, sphere_entry, aabb_entry, analytic_t0, diffuse_wave,
)

RES = int(os.environ.get("RES", "800"))
BLOCK = int(os.environ.get("B", "256"))
NSAMP = int(os.environ.get("NSAMP", "131072"))


def mt_hit_t(o, d, t0, tri):
    """Exact nearest-hit t per ray against all tris (chunked)."""
    v0, v1, v2 = tri
    e1 = v1 - v0
    e2 = v2 - v0
    best = t0.copy()
    chunk = 4096
    for i in range(0, o.shape[0], chunk):
        sl = slice(i, min(i + chunk, o.shape[0]))
        ot, dt = o[sl], d[sl]
        p = np.cross(dt[:, None, :], e2[None, :, :])          # [n,T,3]
        det = np.einsum("ntc,tc->nt", p, e1)
        inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
        s = ot[:, None, :] - v0[None, :, :]
        u = np.einsum("ntc,ntc->nt", s, p) * inv
        q = np.cross(s, e1[None, :, :])
        v = np.einsum("ntc,nc->nt", q, dt) * inv
        t = np.einsum("ntc,tc->nt", q, e2) * inv
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        t = np.where(ok, t, np.inf)
        best[sl] = np.minimum(best[sl], t.min(1))
    return best


def report(name, feas, entry, t_hit, tiles=(256, 512, 1024)):
    n, k = feas.shape
    per_ray = feas.sum(1)
    print(f"--- {name} ---")
    print(f"  per-ray feasible: mean={per_ray.mean():6.2f} p95={np.percentile(per_ray, 95):5.0f}")
    # needed rank per ray: #{feasible blocks with entry < t_hit}
    need = (feas & (entry < t_hit[:, None])).sum(1)
    # a ray needs at least 1 round if it has any feasible block
    need = np.maximum(need, (per_ray > 0).astype(np.int64))
    print(f"  per-ray needed  : mean={need.mean():6.2f} p95={np.percentile(need, 95):5.0f}")
    for ts in tiles:
        m = n // ts * ts
        f = feas[:m].reshape(-1, ts, k)
        u = f.any(1).sum(1)
        # tile ee-depth: for each ray, its needed blocks are a subset of
        # the tile union walked in entry order; the tile walks until the
        # max over rays of the rank (within the TILE's entry-ordered
        # union) of the ray's last needed block. Approximate the rank by
        # counting tile-union blocks whose TILE-MIN entry < ray's t_hit.
        e = np.where(f, entry[:m].reshape(-1, ts, k), np.inf)
        tile_entry = e.min(1)                                  # [G, k]
        th = t_hit[:m].reshape(-1, ts)
        ee = (tile_entry[:, None, :] < th[:, :, None]).sum(2).max(1)
        ee = np.minimum(ee, u)
        print(f"  tile{ts:5d}: union mean={u.mean():6.1f} p95={np.percentile(u, 95):5.0f}"
              f"   ee-rounds mean={ee.mean():6.1f} p95={np.percentile(ee, 95):5.0f}")


def main():
    scene = load(RES)
    c, r, lo, hi, blocks, idx = block_bounds(scene.mesh, BLOCK)
    b0, b1, b2 = blocks
    tri = (b0.reshape(-1, 3), b1.reshape(-1, 3), b2.reshape(-1, 3))

    no, nd, nt0 = diffuse_wave(scene, RES)
    rng = np.random.default_rng(2)
    samp = rng.choice(no.shape[0], NSAMP, replace=False)
    samp.sort()
    no, nd, nt0 = no[samp], nd[samp], nt0[samp]

    es = sphere_entry(no, nd, nt0, c, r)
    ea = aabb_entry(no, nd, nt0, lo, hi)
    ea = np.where(np.isinf(es), np.inf, ea)
    feas = np.isfinite(ea)
    t_hit = mt_hit_t(no, nd, nt0, tri)

    # ordering 0: pixel order
    report("pixel order", feas, ea, t_hit)

    # ordering 1: octant+morton coherence sort (round-2 scheme)
    from kdtreepathtraceroptimization_tpu.ops.cluster import _morton3
    oct_ = ((nd[:, 0] > 0) * 4 + (nd[:, 1] > 0) * 2 + (nd[:, 2] > 0)).astype(np.uint64)
    m = _morton3(no)
    key = (oct_ << np.uint64(60)) | (m >> np.uint64(3))
    srt = np.argsort(key, kind="stable")
    report("octant+morton sort", feas[srt], ea[srt], t_hit[srt])

    # ordering 2: argmin-entry block id (counting-sortable, 1 cull pass)
    am = np.where(feas.any(1), np.argmin(ea, axis=1), feas.shape[1])
    srt = np.argsort(am, kind="stable")
    report("argmin-block bin", feas[srt], ea[srt], t_hit[srt])

    # ordering 3: argmin block + direction octant (finer key)
    key = am.astype(np.uint64) * 8 + oct_
    srt = np.argsort(key, kind="stable")
    report("argmin-block*8+oct bin", feas[srt], ea[srt], t_hit[srt])

    # ordering 4: (octant, argmin block) — octant major
    key = oct_ * np.uint64(feas.shape[1] + 1) + am.astype(np.uint64)
    srt = np.argsort(key, kind="stable")
    report("oct-major, argmin-minor", feas[srt], ea[srt], t_hit[srt])


if __name__ == "__main__":
    main()

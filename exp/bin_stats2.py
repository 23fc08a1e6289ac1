"""Fast feasible-set statistics on cornell+dragon (jax CPU).

Decides the intersector architecture: per-tile union sizes and
early-exit depths under candidate wavefront orderings, plus flagged
(overflow) rates for a given round budget R.

Pure CPU, ~1 min: entry matrix [n, K] via the cluster cull math,
t_hit oracle via the repo's jitted brute intersector.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp

from union_stats_lib import load, diffuse_wave
from kdtreepathtraceroptimization_tpu.ops.cluster import (
    build_cluster_mesh, _entry_math,
)
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute

RES = int(os.environ.get("RES", "800"))
BLOCK = int(os.environ.get("B", "256"))
NSAMP = int(os.environ.get("NSAMP", "65536"))
R = int(os.environ.get("R", "32"))


def entries(cm, o, d, t0, act):
    x = jnp.concatenate([
        jnp.asarray(o) - cm.center_shift, jnp.asarray(d),
        jnp.asarray(t0)[:, None], jnp.asarray(act, jnp.float32)[:, None],
    ], axis=1)
    kp = cm.n_blocks
    prod = x @ cm.cull_w
    e = _entry_math(
        x[:, 0:3], x[:, 3:6], x[:, 6:7], x[:, 7:8] > 0.0,
        cm.blk[3:4, :], cm.blk[4:5, :], cm.blk[5:6, :],
        prod[:, :kp], prod[:, kp:],
    )
    return np.asarray(e)


def report(name, entry, t_hit, kreal, tiles=(256, 1024)):
    n, k = entry.shape
    feas = entry < 1e30
    per_ray = feas.sum(1)
    need = (feas & (entry < t_hit[:, None])).sum(1)
    need = np.maximum(need, (per_ray > 0))
    print(f"--- {name} ---")
    print(f"  per-ray feasible mean={per_ray.mean():6.2f} p95={np.percentile(per_ray,95):5.0f} "
          f"needed mean={need.mean():5.2f} p95={np.percentile(need,95):4.0f}")
    for ts in tiles:
        m = n // ts * ts
        f = feas[:m].reshape(-1, ts, k)
        u = f.any(1).sum(1)
        e = np.where(f, entry[:m].reshape(-1, ts, k), np.inf)
        tile_entry = e.min(1)
        th = t_hit[:m].reshape(-1, ts)
        ee = (tile_entry[:, None, :] < th[:, :, None]).sum(2).max(1)
        ee = np.minimum(ee, u)
        # flagged rays under round budget R: tile union > R and the
        # (R+1)-th entry-ordered block could beat the ray's true t
        srt = np.sort(tile_entry, axis=1)
        over = np.where(u > R, srt[:, R] if R < k else np.inf, np.inf)
        flag = (over[:, None] < th).sum(1)
        print(f"  tile{ts:5d}: union mean={u.mean():6.1f} p95={np.percentile(u,95):5.0f}"
              f"  ee mean={ee.mean():6.1f} p95={np.percentile(ee,95):5.0f}"
              f"  flagged/ray={flag.sum()/m:.4f}")


def main():
    scene = load(RES)
    cm = build_cluster_mesh(scene.mesh, block=BLOCK)
    kreal = cm.n_real_blocks
    print(f"blocks: {kreal} real / {cm.n_blocks} padded, block={BLOCK}")

    no, nd, nt0 = diffuse_wave(scene, RES)
    rng = np.random.default_rng(2)
    samp = np.sort(rng.choice(no.shape[0], NSAMP, replace=False))
    no, nd, nt0 = no[samp], nd[samp], nt0[samp]
    act = np.ones(NSAMP, bool)

    e = entries(cm, no, nd, nt0, act)

    # oracle nearest-t against the FULL mesh, bounded by analytic t0
    f = jax.jit(lambda o, d: intersect_mesh_brute(
        o, d, cm.tris, use_bbox=False).t)
    th = []
    for i in range(0, NSAMP, 8192):
        th.append(np.asarray(f(jnp.asarray(no[i:i + 8192]),
                                jnp.asarray(nd[i:i + 8192]))))
    t_hit = np.minimum(np.concatenate(th), nt0)

    report("pixel order", e, t_hit, kreal)

    am = np.where((e < 1e30).any(1), e.argmin(1), e.shape[1])
    srt = np.argsort(am, kind="stable")
    report("argmin-block bin", e[srt], t_hit[srt], kreal)

    # octant+morton (round-2 scheme)
    from kdtreepathtraceroptimization_tpu.ops.cluster import _morton3
    oct_ = ((nd[:, 0] > 0) * 4 + (nd[:, 1] > 0) * 2 + (nd[:, 2] > 0)).astype(np.uint64)
    mm = _morton3(no)
    key = (oct_ << np.uint64(60)) | (mm >> np.uint64(3))
    srt = np.argsort(key, kind="stable")
    report("octant+morton sort", e[srt], t_hit[srt], kreal)

    # argmin + second-feasible refinement
    e2 = e.copy()
    e2[np.arange(NSAMP), np.clip(am, 0, e.shape[1] - 1)] = np.inf
    am2 = np.where((e2 < 1e30).any(1), e2.argmin(1), e.shape[1])
    key2 = am.astype(np.int64) * (e.shape[1] + 1) + am2
    srt = np.argsort(key2, kind="stable")
    report("(argmin, argmin2) bin", e[srt], t_hit[srt], kreal)



def main_aabb():
    """Same reports but with AABB-slab entry bounds (the round-3 cull)."""
    from union_stats_lib import aabb_entry
    scene = load(RES)
    cm = build_cluster_mesh(scene.mesh, block=BLOCK)
    kreal = cm.n_real_blocks
    # rebuild per-block AABBs (host, same morton order as the build)
    import union_stats_lib as ul
    c, r, lo, hi, blocks, idx = ul.block_bounds(scene.mesh, BLOCK)
    print(f"AABB mode: blocks {kreal} real, block={BLOCK}")

    no, nd, nt0 = diffuse_wave(scene, RES)
    rng = np.random.default_rng(2)
    samp = np.sort(rng.choice(no.shape[0], NSAMP, replace=False))
    no, nd, nt0 = no[samp], nd[samp], nt0[samp]

    e = aabb_entry(no, nd, nt0, lo, hi)
    # pad to kp with inf
    kp = cm.n_blocks
    if e.shape[1] < kp:
        e = np.concatenate([e, np.full((e.shape[0], kp - e.shape[1]),
                                       np.inf, np.float32)], axis=1)

    f = jax.jit(lambda o, d: intersect_mesh_brute(
        o, d, cm.tris, use_bbox=False).t)
    th = []
    for i in range(0, NSAMP, 8192):
        th.append(np.asarray(f(jnp.asarray(no[i:i + 8192]),
                                jnp.asarray(nd[i:i + 8192]))))
    t_hit = np.minimum(np.concatenate(th), nt0)

    report("AABB pixel order", e, t_hit, kreal)
    from kdtreepathtraceroptimization_tpu.ops.cluster import _morton3
    oct_ = ((nd[:, 0] > 0) * 4 + (nd[:, 1] > 0) * 2 + (nd[:, 2] > 0)).astype(np.uint64)
    mm = _morton3(no)
    key = (oct_ << np.uint64(60)) | (mm >> np.uint64(3))
    srt = np.argsort(key, kind="stable")
    report("AABB octant+morton", e[srt], t_hit[srt], kreal)
    am = np.where((e < 1e30).any(1), e.argmin(1), e.shape[1])
    srt = np.argsort(am, kind="stable")
    report("AABB argmin-bin", e[srt], t_hit[srt], kreal)
    # hybrid: octant-major then argmin within
    key2 = (oct_.astype(np.int64) << 32) | am.astype(np.int64)
    srt = np.argsort(key2, kind="stable")
    report("AABB oct>argmin", e[srt], t_hit[srt], kreal)


if __name__ == "__main__":
    if os.environ.get("AABB"):
        main_aabb()
    else:
        main()

"""Compare Morton-chunk blocks vs spatial-partition blocks on
cornell+dragon: per-ray feasible counts and tile unions (jax CPU).

Morton blocks (the current build) chunk a Z-order curve into runs of
256 — cheap but their AABBs overlap heavily. A median-split KD
partition with a 256-triangle leaf cap produces tight, spatially
disjoint leaves. This measures how much that buys every intersector
design (walk rounds scale with tile unions; pair designs with per-ray
feasible counts).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/exp")

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp

from union_stats_lib import load, diffuse_wave, aabb_entry, block_bounds
from kdtreepathtraceroptimization_tpu.ops.cluster import build_cluster_mesh, _morton3
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute

RES = int(os.environ.get("RES", "800"))
BLOCK = int(os.environ.get("B", "256"))
NSAMP = int(os.environ.get("NSAMP", "65536"))


def kd_blocks(mesh, cap):
    """Median-split partition of triangles into <=cap leaf clusters.

    Splits on the widest centroid axis at the median until each node
    holds <= cap triangles. Returns per-block (lo, hi) and the
    triangle order (concatenated leaves)."""
    v0 = np.asarray(mesh.v0, np.float32)
    v1 = np.asarray(mesh.v1, np.float32)
    v2 = np.asarray(mesh.v2, np.float32)
    cent = (v0 + v1 + v2) / 3.0
    tlo = np.minimum(v0, np.minimum(v1, v2))
    thi = np.maximum(v0, np.maximum(v1, v2))

    leaves = []

    def rec(idx):
        if idx.size <= cap:
            leaves.append(idx)
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(0) - c.min(0)))
        med = np.argsort(c[:, ax], kind="stable")
        half = idx.size // 2
        rec(idx[med[:half]])
        rec(idx[med[half:]])

    rec(np.arange(v0.shape[0]))
    lo = np.stack([tlo[ix].min(0) for ix in leaves])
    hi = np.stack([thi[ix].max(0) for ix in leaves])
    return lo, hi, leaves


def stats(name, e, tiles=(256,)):
    n, k = e.shape
    feas = np.isfinite(e)
    per_ray = feas.sum(1)
    print(f"--- {name} (K={k}) ---")
    print(f"  per-ray feasible mean={per_ray.mean():6.2f} p95={np.percentile(per_ray,95):5.0f}")
    for ts in tiles:
        m = n // ts * ts
        u = feas[:m].reshape(-1, ts, k).any(1).sum(1)
        print(f"  tile{ts:5d}: union mean={u.mean():6.1f} p95={np.percentile(u,95):5.0f}"
              f"  rounds/ray={u.sum()/m:.4f}")
    return per_ray


def main():
    scene = load(RES)
    no, nd, nt0 = diffuse_wave(scene, RES)
    rng = np.random.default_rng(2)
    samp = np.sort(rng.choice(no.shape[0], NSAMP, replace=False))
    no, nd, nt0 = no[samp], nd[samp], nt0[samp]
    oct_ = ((nd[:, 0] > 0) * 4 + (nd[:, 1] > 0) * 2 + (nd[:, 2] > 0)).astype(np.int64)

    def run(name, lo, hi):
        e = aabb_entry(no, nd, nt0, lo, hi)
        k = e.shape[1]
        am = np.where(np.isfinite(e).any(1),
                      np.argmin(np.where(np.isfinite(e), e, np.inf), axis=1), k)
        key = oct_ * (k + 1) + am
        srt = np.argsort(key, kind="stable")
        stats(name, e[srt])

    c, r, lo, hi, blocks, idx = block_bounds(scene.mesh, BLOCK)
    run(f"morton B={BLOCK}", lo, hi)

    for cap in (256, 128, 64):
        lo2, hi2, leaves = kd_blocks(scene.mesh, cap)
        sizes = np.array([len(ix) for ix in leaves])
        print(f"[kd cap={cap}: {len(leaves)} leaves, size mean={sizes.mean():.0f}]")
        run(f"kd-leaf cap={cap}", lo2, hi2)


if __name__ == "__main__":
    main()

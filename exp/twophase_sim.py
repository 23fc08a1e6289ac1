"""Simulate the two-phase walk on cornell+dragon (jax CPU).

Phase A walks the first A entry-ordered blocks of each tile. Rays whose
true nearest hit lies in those blocks end with bt = t_hit; the rest
keep bt = t0. Phase B re-culls with entry < bt, drops the blocks
already walked (per tile), re-sorts the surviving rays, and walks the
remaining unions exhaustively. Reported: phase-B per-ray counts, tile
unions, and the projected total rounds/ray vs the single-phase walk.
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
A = int(os.environ.get("A", "8"))
TS = int(os.environ.get("TS", "256"))


def main():
    scene = load(RES)
    cm = build_cluster_mesh(scene.mesh, block=BLOCK)
    c, r, lo, hi, blocks, idx = block_bounds(scene.mesh, BLOCK)

    no, nd, nt0 = diffuse_wave(scene, RES)
    rng = np.random.default_rng(2)
    samp = np.sort(rng.choice(no.shape[0], NSAMP, replace=False))
    no, nd, nt0 = no[samp], nd[samp], nt0[samp]

    e = aabb_entry(no, nd, nt0, lo, hi)          # [n, k] inf=infeasible
    k = e.shape[1]

    f = jax.jit(lambda o, d: intersect_mesh_brute(o, d, cm.tris,
                                                  use_bbox=False).t)
    th = []
    for i in range(0, NSAMP, 8192):
        th.append(np.asarray(f(jnp.asarray(no[i:i + 8192]),
                                jnp.asarray(nd[i:i + 8192]))))
    t_hit = np.minimum(np.concatenate(th), nt0)

    # order: octant-major, argmin-minor
    oct_ = ((nd[:, 0] > 0) * 4 + (nd[:, 1] > 0) * 2 + (nd[:, 2] > 0)).astype(np.int64)
    am = np.where(np.isfinite(e).any(1), np.nanargmin(np.where(np.isfinite(e), e, np.inf), axis=1), k)
    key = oct_ * (k + 1) + am
    srt = np.argsort(key, kind="stable")
    e, t_hit, nt0_s = e[srt], t_hit[srt], nt0[srt]
    no_s, nd_s = no[srt], nd[srt]

    n = NSAMP // TS * TS
    e, t_hit, nt0_s = e[:n], t_hit[:n], nt0_s[:n]
    g = n // TS
    feas = np.isfinite(e)
    et = np.where(feas, e, np.inf).reshape(g, TS, k)
    tile_entry = et.min(1)                               # [g, k]
    order = np.argsort(tile_entry, axis=1)               # entry order per tile
    union = (tile_entry < np.inf).sum(1)

    # phase A: first A tile-ordered blocks
    firstA = order[:, :A]                                # [g, A]
    inA = np.zeros((g, k), bool)
    np.put_along_axis(inA, firstA, tile_entry[np.arange(g)[:, None], firstA] < np.inf, axis=1)
    # ray's winner block: the feasible block containing its true hit —
    # approximate: ray resolved in phase A iff every feasible block with
    # entry < t_hit is in A's set  (conservative: then its walk found
    # the true hit and proved it)
    inA_r = np.repeat(inA[:, None, :], TS, axis=1)       # [g, TS, k]
    needs = feas.reshape(g, TS, k) & (et < t_hit.reshape(g, TS, 1))
    resolved = ~(needs & ~inA_r).any(2)                  # [g, TS]
    bt = np.where(resolved.reshape(-1), t_hit, nt0_s)

    roundsA = np.minimum(union, A)

    # phase B: feasible blocks with entry < bt, not already in A
    feasB = feas.reshape(g, TS, k) & (et < bt.reshape(g, TS, 1)) & ~inA_r
    cntB = feasB.reshape(n, k).sum(1)
    liveB = cntB > 0
    print(f"A={A} tile={TS}: phase-A rounds/tile mean={roundsA.mean():.1f}")
    print(f"phase-B live rays: {liveB.mean()*100:.1f}%  per-ray feasible "
          f"mean={cntB[liveB].mean() if liveB.any() else 0:.2f} "
          f"p95={np.percentile(cntB[liveB],95) if liveB.any() else 0:.0f}")

    # re-sort live rays by (octant, argmin of remaining)
    eB = np.where(feasB.reshape(n, k), et.reshape(n, k), np.inf)
    amB = np.where(liveB, np.argmin(eB, axis=1), k)
    octB = oct_[srt][:n]
    keyB = np.where(liveB, octB * (k + 1) + amB, (1 << 30))
    srtB = np.argsort(keyB, kind="stable")
    fB = feasB.reshape(n, k)[srtB]
    m2 = liveB.sum() // TS * TS
    uB = fB[:m2].reshape(-1, TS, k).any(1).sum(1)
    totalB = uB.sum()
    per_bounce = (roundsA.sum() + totalB) / n
    print(f"phase-B tiles: union mean={uB.mean():.1f} p95={np.percentile(uB,95):.0f}")
    print(f"TOTAL rounds/ray: single-phase={union.sum()/n:.3f} "
          f"two-phase={per_bounce:.3f}")


if __name__ == "__main__":
    main()

"""Bisect the dragon-scale TPU worker crash, one kernel at a time.

Usage: python exp/crash_bisect.py <phase>
  1 = cull kernel only                  (_cull_pallas at dragon scale)
  2 = cull + select + cluster kernel    (_cluster_pallas, no repair)
  3 = sweep kernel alone                (_sweep_pallas, the repair path)
  4 = full intersect_mesh_cluster       (everything incl. lax.cond repair)
  5 = full at 512x512 (stage-2 check)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops import cluster as cl
from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from bench import _mesh_scene

phase = int(sys.argv[1]) if len(sys.argv) > 1 else 1
res = 512 if phase == 5 else 800
print(f"phase {phase}: devices={jax.devices()}", flush=True)
scene, n_tris, label = _mesh_scene(res, None)
print(f"scene: {label} {n_tris} tris", flush=True)
cm = scene.cmesh
config = RenderConfig(cluster=True)
tile, rounds, block = config.cluster_tile, config.cluster_rounds, cm.block
kp = cm.n_blocks
n = res * res
print(f"tile={tile} rounds={rounds} block={block} kp={kp} n={n}", flush=True)

rng = np.random.default_rng(0)
origin = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
direction = jnp.asarray(d)
t0 = jnp.full((n,), cl.BIG, jnp.float32)
act = jnp.ones((n,), jnp.float32)

x = jnp.concatenate([origin, direction, t0[:, None], act[:, None]], axis=1)
r = mxu_bf.ray_features(origin, direction)
r = jnp.concatenate([r, jnp.zeros((n, 6), jnp.float32)], axis=1)


def force(v):
    return float(np.asarray(jax.tree.leaves(v)[0]).ravel()[0])


def run(label, fn):
    t = time.perf_counter()
    out = fn()
    c = time.perf_counter() - t
    t = time.perf_counter()
    out = fn()
    e = time.perf_counter() - t
    print(f"{label}: ok  compile+run={c:.1f}s  run2={e*1e3:.1f}ms  val={force(out):.4f}",
          flush=True)
    return out


if phase == 1:
    run("cull", lambda: jax.block_until_ready(
        cl._cull_pallas(x, cm.cull_w, cm.blk, tile, False)))
elif phase == 2:
    tile_entry = cl._cull_pallas(x, cm.cull_w, cm.blk, tile, False)
    sel, lb, lb_over = cl._select(tile_entry, rounds)
    sel, lb = jax.block_until_ready((sel, lb))
    print("select ok", flush=True)
    run("cluster", lambda: jax.block_until_ready(
        cl._cluster_pallas(sel, lb, r, t0, act, cm.w, tile, block,
                           int(sel.shape[1]), False)))
elif phase == 3:
    run("sweep", lambda: jax.block_until_ready(
        cl._sweep_pallas(r, t0, cm.w, tile, block, False)))
elif phase in (4, 5):
    run("full", lambda: jax.block_until_ready(
        cl.intersect_mesh_cluster(origin, direction, cm, config)))
elif phase in (6, 7, 8):
    # Watchdog probe: chain the full intersect N times in ONE dispatch.
    # phase 6: ~25 s on-device; phase 7: ~100 s; phase 8: ~200 s.
    reps = {6: 30, 7: 120, 8: 240}[phase]
    import jax.numpy as jnp

    def once(i, o):
        hit = cl.intersect_mesh_cluster(o, direction, cm, config)
        # feed t back into origins to chain a data dependency
        return o + 1e-9 * hit.t[:, None]

    f = jax.jit(lambda o: jax.lax.fori_loop(0, reps, once, o).sum())
    t = time.perf_counter()
    v = float(np.asarray(f(origin)))
    print(f"chain x{reps}: ok {time.perf_counter()-t:.1f}s val={v:.3f}", flush=True)

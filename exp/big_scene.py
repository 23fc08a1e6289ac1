"""Reference-extreme-scale sweep row (VERDICT r4 item 3): full-iteration
cost at >=1M triangles on the real TPU, production pairs intersector vs
the exhaustive walk fallback. Writes artifacts/SWEEP_r05_big.json.

The reference demonstrated an Audi R8 at 1.69M verts and Gutenberg at
3M+ (/root/reference/README.md:163-181); those meshes are stripped from
the mount, so a procedural icosphere stands in (subdiv 8 = 1.31M faces).
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj

RES = int(os.environ.get("RES", "800"))
ITERS = int(os.environ.get("ITERS", "4"))
SUBDIVS = [int(s) for s in os.environ.get("SUBDIVS", "7,8").split(",")]

rows = []
for subdiv in SUBDIVS:
    t0 = time.time()
    verts, faces = icosphere(subdiv, radius=2.5, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene_path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                              "cornell.txt")
    scene = with_resolution(
        load_scene(scene_path, obj_path=tmp.name, build_kd=False), RES, RES)
    n_tris = int(scene.mesh.v0.shape[0])
    n_blocks = int(scene.cmesh.n_blocks) if scene.cmesh is not None else 0
    print(f"subdiv={subdiv}: {n_tris} tris, {n_blocks} blocks, "
          f"build {time.time()-t0:.1f}s", flush=True)

    n = RES * RES
    key = jax.random.PRNGKey(0)
    row = {"subdiv": subdiv, "tris": n_tris, "blocks": n_blocks,
           "res": RES, "depth": 8}
    for mode, over in (
        ("pairs", dict(cluster=True, cluster_pairs=True)),
        ("walk", dict(cluster=True, cluster_walk=True, cluster_pairs=False)),
    ):
        cfg = RenderConfig(trace_depth=8, antialias=True, scan_bounces=True,
                           **over)
        try:
            block = make_render_block_fn(scene, cfg, ITERS)
            f = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
            float(np.asarray(f[0, 0]))
            best = 1e9
            for _ in range(3):
                t = time.perf_counter()
                f = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
                float(np.asarray(f[0, 0]))
                best = min(best, (time.perf_counter() - t) / ITERS)
            row[mode + "_ms"] = best * 1e3
            row[mode + "_mrays"] = n * 8 / best / 1e6
            print(f"  {mode:6s} {best*1e3:9.1f} ms/iter "
                  f"({n*8/best/1e6:6.2f} Mrays/s)", flush=True)
        except Exception as e:  # record, keep sweeping
            row[mode + "_error"] = str(e)[:200]
            print(f"  {mode} FAILED: {e}", flush=True)
    rows.append(row)

out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "SWEEP_r05_big.json")
json.dump({"rows": rows, "note": "full-iteration ms, chained on-device, "
           "best-of-3; procedural icosphere stand-in for the stripped "
           "R8/Gutenberg meshes"}, open(out, "w"), indent=1)
print("wrote", out, flush=True)

"""Backward-pass benchmark (VERDICT r4 missing #5): BENCH-style number
for the DIFFERENTIABLE path on the real TPU — one full train step
(forward render + material grads + adam update) through the PRODUCTION
pairs intersector. Writes artifacts/GRADBENCH_r05.json.
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
from kdtreepathtraceroptimization_tpu.models.inverse import make_train_step
from kdtreepathtraceroptimization_tpu.render.integrator import render
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj

RES = int(os.environ.get("RES", "256"))
DEPTH = int(os.environ.get("DEPTH", "4"))
REPS = int(os.environ.get("REPS", "8"))

verts, faces = icosphere(5, radius=2.5, center=(0.0, 3.0, 0.0))
tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
tmp.close()
write_obj(tmp.name, verts, faces)
scene_path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                          "cornell.txt")
scene = with_resolution(
    load_scene(scene_path, obj_path=tmp.name, build_kd=False), RES, RES)
n_tris = int(scene.mesh.v0.shape[0])
n = RES * RES
cfg = RenderConfig(trace_depth=DEPTH, antialias=True, scan_bounces=True,
                   cluster=True, cluster_pairs=True)

target = jnp.asarray(np.asarray(
    render(scene, cfg, spp=1, seed=1)).reshape(n, 3))
init_state, train_step = make_train_step(scene, cfg, target)
state = init_state()
key = jax.random.PRNGKey(0)

t0 = time.time()
state, loss = train_step(state, key, jnp.int32(1))
print(f"compile+1 step {time.time()-t0:.1f}s loss={float(loss):.5f}",
      flush=True)

best = 1e9
for rep in range(3):
    t0 = time.perf_counter()
    for i in range(REPS):
        state, loss = train_step(state, key, jnp.int32(2 + rep * REPS + i))
    jax.block_until_ready(loss)
    best = min(best, (time.perf_counter() - t0) / REPS)

fwd_bwd_rays = n * DEPTH  # forward bounce-rays; backward revisits them
out = {
    "metric": f"train-steps/sec (cornell+icosphere {n_tris}tris, "
              f"{RES}x{RES}, depth {DEPTH}, pairs, material grads)",
    "ms_per_step": round(best * 1e3, 2),
    "steps_per_sec": round(1.0 / best, 3),
    "fwd_rays_per_sec": round(fwd_bwd_rays / best, 1),
    "final_loss": float(loss),
    "note": "full differentiable step: forward render + reverse-mode "
            "material gradients through the production pairs "
            "intersector (detached-index estimator) + adam update; "
            "chained on host, best-of-3",
}
path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                    "GRADBENCH_r05.json")
json.dump(out, open(path, "w"), indent=1)
print(json.dumps(out), flush=True)

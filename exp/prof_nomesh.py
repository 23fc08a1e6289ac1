"""Profile the nomesh iteration on TPU and print top HLO ops by self time."""
import glob, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import trace_iteration
from bench import _mesh_scene

RES = 800
scene, n_tris, label = _mesh_scene(RES, None)
n = RES * RES
key = jax.random.PRNGKey(0)
cfg = RenderConfig(trace_depth=8, antialias=True, scan_bounces=True)

@jax.jit
def step(film, it):
    return film + trace_iteration(
        scene.geoms, scene.materials, None, None, scene.camera, cfg, key, it)

@jax.jit
def block(film):
    return jax.lax.fori_loop(0, 4, lambda i, f: step(f, i), film)[0, 0]

float(np.asarray(block(jnp.zeros((n, 3), jnp.float32))))

logdir = "/tmp/prof_nomesh"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    float(np.asarray(block(jnp.zeros((n, 3), jnp.float32))))

xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane:", xs, flush=True)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
import gzip, json, io, csv
# data is csv text
rows = list(csv.reader(io.StringIO(data.decode() if isinstance(data, bytes) else data)))
hdr = rows[0]
print(hdr, flush=True)
for r in rows[1:25]:
    print(r, flush=True)

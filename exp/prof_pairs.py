"""Profile one full pairs iteration (dragon, 800x800, depth 8) on TPU
and print top HLO leaf ops by self time."""
import glob, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn
from bench import _mesh_scene

RES = 800
MODE = os.environ.get("MODE", "pairs")
scene, n_tris, label = _mesh_scene(RES, None)
n = RES * RES
key = jax.random.PRNGKey(0)
kwargs = dict(trace_depth=8, antialias=True, scan_bounces=True, cluster=True)
if MODE == "pairs":
    kwargs.update(cluster_pairs=True)
else:
    kwargs.update(cluster_walk=True, cluster_pairs=False)
cfg = RenderConfig(**kwargs)
block = make_render_block_fn(scene, cfg, 2)
f = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
float(np.asarray(f[0, 0]))

import time
t0 = time.perf_counter()
f = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
float(np.asarray(f[0, 0]))
dt = (time.perf_counter() - t0) / 2
print(f"{MODE}: {dt*1e3:.1f} ms/iter ({dt/8/n*1e9:.0f} ns/ray/bounce)", flush=True)

logdir = f"/tmp/prof_{MODE}"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    f = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
    float(np.asarray(f[0, 0]))

from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
space = xplane_pb2.XSpace()
space.ParseFromString(open(xs[0], 'rb').read())
for plane in space.planes:
    if "TPU" not in plane.name:
        continue
    tot = {}
    cnt = {}
    for line in plane.lines:
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            tot[name] = tot.get(name, 0) + ev.duration_ps
            cnt[name] = cnt.get(name, 0) + 1
    print(f"== plane {plane.name}")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v/1e9:10.3f} ms x{cnt[k]:4d}  {k[:140]}")

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax, jax.numpy as jnp, numpy as np
from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.edgegrad import make_render_geo
from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution
from test_edgegrad import _occluder_scene, RES

scene, verts, faces = _occluder_scene()
scene = with_resolution(scene, RES, RES)
config = RenderConfig(trace_depth=1, antialias=False)
key = jax.random.PRNGKey(0)
cam_pos = jnp.asarray(scene.camera.position)
ramp_lo = (jnp.arange(RES * RES) % RES).astype(jnp.float32) / RES

# FD targets from previous run:
fd = {"v0z": -0.000652, "v1z": -0.000801, "v2x": -0.000229, "allx": -0.0011673}

for K, delta in [(64, 0.3), (256, 0.3), (256, 0.1), (256, 0.05), (512, 0.02), (256, 0.6)]:
    rg = make_render_geo(scene, verts, faces, config, samples_per_edge=K, delta=delta)
    def loss(v, c):
        return jnp.mean(rg(v, c, key, jnp.int32(1)) * ramp_lo[:, None])
    gv = np.asarray(jax.jit(jax.grad(loss))(verts, cam_pos))
    print(f"K={K} delta={delta}: v0z={gv[0,2]:+.6f}({fd['v0z']:+.6f}) v1z={gv[1,2]:+.6f}({fd['v1z']:+.6f}) "
          f"v2x={gv[2,0]:+.6f}({fd['v2x']:+.6f}) allx={gv[:,0].sum():+.6f}({fd['allx']:+.6f})")

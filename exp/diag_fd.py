import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax, jax.numpy as jnp, numpy as np
from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.edgegrad import retris
from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
from kdtreepathtraceroptimization_tpu.render.integrator import trace_rays
from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution
from test_edgegrad import _occluder_scene, RES

scene, verts, faces = _occluder_scene()
scene = with_resolution(scene, RES, RES)
config = RenderConfig(trace_depth=1, antialias=False)
key = jax.random.PRNGKey(0)
f = jnp.asarray(faces)

def make_loss(SS):
    hi = with_resolution(scene, RES * SS, RES * SS)
    ramp_hi = ((jnp.arange(RES * SS * RES * SS) % (RES * SS)) // SS).astype(jnp.float32) / RES
    @jax.jit
    def loss(verts):
        kd_t = retris(scene.kd, verts, f)
        mesh_t = scene.mesh._replace(v0=verts[f[:, 0]], v1=verts[f[:, 1]], v2=verts[f[:, 2]])
        rays = generate_rays(hi.camera, config, bounce_key(key, 1, 0), config.effective_depth)
        img = trace_rays(rays, scene.geoms, scene.materials, mesh_t, kd_t, config, key, jnp.int32(1))
        return jnp.mean(img * ramp_hi[:, None])
    return loss

for SS in (4, 8, 16):
    loss = make_loss(SS)
    for eps in (0.04, 0.08, 0.16):
        out = []
        for (i, c) in [(0, 2), (1, 2), (2, 0)]:
            e = np.zeros((3, 3), np.float32); e[i, c] = eps
            ej = jnp.asarray(e)
            fd = (float(loss(verts + ej)) - float(loss(verts - ej))) / (2 * eps)
            out.append(f"v{i}{'xyz'[c]}={fd:+.6f}")
        print(f"SS={SS} eps={eps}: " + " ".join(out))

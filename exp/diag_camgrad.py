"""Diagnose the camera boundary-gradient 2x mismatch.

Invariant: boundary term depends on screen projection of X - pos only,
so d_cam (boundary) == -sum_v d_verts (boundary). Check estimator
self-consistency first, then FD both ways.
"""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.edgegrad import make_render_geo
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
from test_edgegrad import _occluder_scene, _loss_fd, RES, SS

scene, verts, faces = _occluder_scene()
scene = with_resolution(scene, RES, RES)
config = RenderConfig(trace_depth=1, antialias=False)

render_geo = make_render_geo(scene, verts, faces, config, samples_per_edge=64)
key = jax.random.PRNGKey(0)
cam_pos = jnp.asarray(scene.camera.position)

ramp_lo = (jnp.arange(RES * RES) % RES).astype(jnp.float32) / RES

def loss_ad_ramp(verts, cam_pos):
    img = render_geo(verts, cam_pos, key, jnp.int32(1))
    return jnp.mean(img * ramp_lo[:, None])

gv, gc = jax.jit(jax.grad(loss_ad_ramp, argnums=(0, 1)))(verts, cam_pos)
gv, gc = np.asarray(gv), np.asarray(gc)
print("gv sum over vertices:", gv.sum(0))
print("gc:", gc)
print("gc should ~= -gv.sum(0) (boundary part; interior may differ)")

# FD: move ALL vertices by +eps on x, on the ramp loss (mesh - plain at
# same camera cancels plain exactly since plain doesn't depend on verts)
from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
from kdtreepathtraceroptimization_tpu.ops.edgegrad import retris
from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
from kdtreepathtraceroptimization_tpu.render.integrator import trace_rays

hi = with_resolution(scene, RES * SS, RES * SS)
ramp_hi = ((jnp.arange(RES * SS * RES * SS) % (RES * SS)) // SS).astype(jnp.float32) / RES
f = jnp.asarray(faces)

@jax.jit
def loss_hi_verts(verts):
    kd_t = retris(scene.kd, verts, f)
    mesh_t = scene.mesh._replace(v0=verts[f[:, 0]], v1=verts[f[:, 1]], v2=verts[f[:, 2]])
    rays = generate_rays(hi.camera, config, bounce_key(key, 1, 0), config.effective_depth)
    img = trace_rays(rays, scene.geoms, scene.materials, mesh_t, kd_t, config, key, jnp.int32(1))
    return jnp.mean(img * ramp_hi[:, None])

eps = 0.08
e = jnp.zeros_like(verts).at[:, 0].add(eps)
fd_all_x = (float(loss_hi_verts(verts + e)) - float(loss_hi_verts(verts - e))) / (2 * eps)
print("FD (all verts +x):", fd_all_x, " vs AD gv[:,0].sum():", gv[:, 0].sum())

@jax.jit
def loss_hi_cam(cam_pos):
    cam = hi.camera._replace(position=cam_pos)
    kd_t = retris(scene.kd, verts, f)
    mesh_t = scene.mesh._replace(v0=verts[f[:, 0]], v1=verts[f[:, 1]], v2=verts[f[:, 2]])
    rays = generate_rays(cam, config, bounce_key(key, 1, 0), config.effective_depth)
    img_m = trace_rays(rays, scene.geoms, scene.materials, mesh_t, kd_t, config, key, jnp.int32(1))
    img_0 = trace_rays(rays, scene.geoms, scene.materials, None, None, config, key, jnp.int32(1))
    return jnp.mean((img_m - img_0) * ramp_hi[:, None])

vals = []
for sgn in (+1.0, -1.0):
    p = np.asarray(cam_pos).copy()
    p[0] += sgn * eps
    vals.append(float(loss_hi_cam(jnp.asarray(p))))
fd_cam_x = (vals[0] - vals[1]) / (2 * eps)
print("FD (cam +x, mesh-minus-plain):", fd_cam_x, " vs AD gc[0]:", gc[0])

print("\nper-component FD vs AD:")
for i in range(3):
    for c in range(3):
        e = np.zeros((3, 3), np.float32); e[i, c] = eps
        ej = jnp.asarray(e)
        fd = (float(loss_hi_verts(verts + ej)) - float(loss_hi_verts(verts - ej))) / (2 * eps)
        print(f"  v{i}.{'xyz'[c]}: fd={fd:+.6f} ad={gv[i,c]:+.6f} ratio={fd/gv[i,c] if abs(gv[i,c])>1e-9 else float('nan'):+.2f}")

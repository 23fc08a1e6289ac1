"""Shared pieces for the feasible-set experiments (pure numpy)."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def load(res):
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
    scene = load_scene("/root/repo/scenes/cornell.txt",
                       obj_path="/root/reference/scenes/dragon.obj",
                       build_kd=False, build_cluster=False)
    return with_resolution(scene, res, res)


def block_bounds(mesh, block):
    from kdtreepathtraceroptimization_tpu.ops.cluster import _morton3
    v0 = np.asarray(mesh.v0, np.float32)
    v1 = np.asarray(mesh.v1, np.float32)
    v2 = np.asarray(mesh.v2, np.float32)
    cent = (v0 + v1 + v2) / 3.0
    order = np.argsort(_morton3(cent), kind="stable")
    t = v0.shape[0]
    pad = (-t) % block
    idx = np.concatenate([order, np.full(pad, order[-1], np.int64)])
    b0 = v0[idx].reshape(-1, block, 3)
    b1 = v1[idx].reshape(-1, block, 3)
    b2 = v2[idx].reshape(-1, block, 3)
    if pad:
        b1.reshape(-1, 3)[t:] = b0.reshape(-1, 3)[t:]
        b2.reshape(-1, 3)[t:] = b0.reshape(-1, 3)[t:]
    lo = np.minimum(b0.min(1), np.minimum(b1.min(1), b2.min(1)))
    hi = np.maximum(b0.max(1), np.maximum(b1.max(1), b2.max(1)))
    c = 0.5 * (lo + hi)
    r = 0.5 * np.linalg.norm(hi - lo, axis=1) + 1e-5
    return c, r, lo, hi, (b0, b1, b2), idx


def sphere_entry(o, d, t0, c, r):
    out = np.empty((o.shape[0], c.shape[0]), np.float32)
    chunk = 65536
    for i in range(0, o.shape[0], chunk):
        sl = slice(i, min(i + chunk, o.shape[0]))
        oc = o[sl][:, None, :] - c[None, :, :]
        t_ca = -np.einsum("nkc,nc->nk", oc, d[sl])
        d2 = np.einsum("nkc,nkc->nk", oc, oc) - t_ca * t_ca
        entry = np.maximum(t_ca - r[None, :], 0.0)
        feas = (d2 <= (r * r)[None, :]) & (t_ca + r[None, :] > 0) & (entry < t0[sl][:, None])
        out[sl] = np.where(feas, entry, np.inf)
    return out


def aabb_entry(o, d, t0, lo, hi):
    out = np.empty((o.shape[0], lo.shape[0]), np.float32)
    chunk = 32768
    for i in range(0, o.shape[0], chunk):
        sl = slice(i, min(i + chunk, o.shape[0]))
        inv = 1.0 / np.where(np.abs(d[sl]) < 1e-12, 1e-12, d[sl])
        t1 = (lo[None, :, :] - o[sl][:, None, :]) * inv[:, None, :]
        t2 = (hi[None, :, :] - o[sl][:, None, :]) * inv[:, None, :]
        tmin = np.minimum(t1, t2).max(2)
        tmax = np.maximum(t1, t2).min(2)
        feas = (tmax >= np.maximum(tmin, 0.0)) & (tmin < t0[sl][:, None])
        out[sl] = np.where(feas, np.maximum(tmin, 0.0), np.inf)
    return out


def analytic_t0(scene, o, d):
    from kdtreepathtraceroptimization_tpu.ops import intersect as isect
    import jax.numpy as jnp
    hit = isect.intersect_geoms(jnp.asarray(o), jnp.asarray(d), scene.geoms)
    return np.asarray(hit.t), np.asarray(hit.point), np.asarray(hit.normal)


def diffuse_wave(scene, res):
    """Primary rays -> analytic wall hits -> cosine-hemisphere bounce."""
    import jax
    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key

    rays = generate_rays(scene.camera, RenderConfig(),
                         bounce_key(jax.random.PRNGKey(0), 1, 0), 8)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    t0, hitp, hitn = analytic_t0(scene, o, d)

    rng = np.random.default_rng(1)
    u1 = rng.random(o.shape[0]).astype(np.float32)
    u2 = rng.random(o.shape[0]).astype(np.float32)
    st = np.sqrt(u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(hitn[:, 0:1]) > 0.9, [0, 1, 0], [1, 0, 0]).astype(np.float32)
    t1v = np.cross(hitn, a)
    t1v /= np.linalg.norm(t1v, axis=1, keepdims=True) + 1e-12
    t2v = np.cross(hitn, t1v)
    nd = (np.sqrt(np.maximum(0, 1 - u1))[:, None] * hitn
          + (st * np.cos(phi))[:, None] * t1v + (st * np.sin(phi))[:, None] * t2v)
    nd /= np.linalg.norm(nd, axis=1, keepdims=True) + 1e-12
    no = hitp + 1e-4 * hitn
    nt0, _, _ = analytic_t0(scene, no, nd)
    return no, nd, np.minimum(nt0, 1e4).astype(np.float32)

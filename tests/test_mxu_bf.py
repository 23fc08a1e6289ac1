"""MXU-form (det-form matmul) brute-force intersector vs the streaming
VPU oracle (ops/mesh.intersect_mesh_brute), plus the fused Pallas kernel
in interpreter mode. Reference behavior being reproduced: the
brute-force OBJ loop of pathTraceOneBounce (pathtrace.cu:487-628)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kdtreepathtraceroptimization_tpu.ops import mxu_bf
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG


class _M:
    pass


def _soup(rng, t):
    c = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.3, (t, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.3, (t, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.3, (t, 3)).astype(np.float32)
    m = _M()
    m.v0, m.v1, m.v2 = v0, v1, v2
    return m


def _rays(rng, n):
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(ref, got, o, d, mesh):
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    hit_r, hit_g = rt < BIG, gt < BIG
    np.testing.assert_array_equal(hit_r, hit_g)
    np.testing.assert_allclose(gt[hit_g], rt[hit_r], rtol=1e-3, atol=1e-3)
    # same winning triangle everywhere (no duplicates in a soup)
    np.testing.assert_array_equal(
        np.asarray(ref.tri)[hit_r], np.asarray(got.tri)[hit_g]
    )


@pytest.mark.parametrize("t_count", [97, 700])
def test_mxu_ref_matches_oracle(t_count):
    rng = np.random.default_rng(0)
    mesh = _soup(rng, t_count)
    o, d = _rays(rng, 500)
    ref = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    got = mxu_bf.intersect_brute_mxu_ref(
        o, d, mesh.v0, mesh.v1, mesh.v2, block=128
    )
    _check(ref, got, o, d, mesh)


def test_mxu_pallas_interpret_matches_oracle():
    rng = np.random.default_rng(1)
    mesh = _soup(rng, 300)
    o, d = _rays(rng, 300)
    ref = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    got = mxu_bf.intersect_brute_mxu(
        o, d, mesh.v0, mesh.v1, mesh.v2,
        ray_tile=128, tri_block=128, interpret=True,
    )
    _check(ref, got, o, d, mesh)


def test_mxu_t_max_bounds_search():
    rng = np.random.default_rng(2)
    mesh = _soup(rng, 200)
    o, d = _rays(rng, 256)
    ref = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    rt = np.asarray(ref.t)
    t_low = jnp.full((256,), 1e-3, jnp.float32)
    got = mxu_bf.intersect_brute_mxu_ref(o, d, mesh.v0, mesh.v1, mesh.v2,
                                         t_max=t_low, block=128)
    assert (np.asarray(got.t) >= BIG).all()
    t_hi = jnp.asarray(np.where(rt < BIG, rt * 1.5, BIG).astype(np.float32))
    got2 = mxu_bf.intersect_brute_mxu_ref(o, d, mesh.v0, mesh.v1, mesh.v2,
                                          t_max=t_hi, block=128)
    hit2 = np.asarray(got2.t) < BIG
    np.testing.assert_array_equal(hit2, rt < BIG)


def test_integrator_mxu_brute_matches_vpu_brute():
    """End-to-end: rendering with mxu_brute on/off gives the same image
    (same RNG, same scene) — the intersector swap is invisible."""
    import os
    from kdtreepathtraceroptimization_tpu import RenderConfig
    from kdtreepathtraceroptimization_tpu.scene import load_scene
    from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution
    from kdtreepathtraceroptimization_tpu.render.integrator import render

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    obj = "/root/reference/scenes/sphere_low_1.obj"
    if not os.path.exists(obj):
        pytest.skip("reference obj not mounted")
    scene = with_resolution(
        load_scene(os.path.join(root, "scenes", "cornell.txt"), obj_path=obj),
        48, 48,
    )
    img_mxu = np.asarray(render(
        scene, RenderConfig(trace_depth=4, enable_kd=False, mxu_brute=True),
        spp=2, seed=0))
    img_vpu = np.asarray(render(
        scene, RenderConfig(trace_depth=4, enable_kd=False, mxu_brute=False),
        spp=2, seed=0))
    assert np.isfinite(img_mxu).all()
    np.testing.assert_allclose(img_mxu, img_vpu, rtol=1e-3, atol=1e-3)

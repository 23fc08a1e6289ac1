"""End-to-end mesh rendering: cornell + OBJ with KD vs brute oracle."""

import os

import numpy as np
import pytest

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import render
from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from tests.meshutil import icosphere, write_obj

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")


@pytest.fixture(scope="module")
def mesh_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("obj")
    verts, faces = icosphere(2, radius=2.0, center=(0.0, 3.0, 0.0))
    path = str(d / "ball.obj")
    write_obj(path, verts, faces)
    scene = load_scene(SCENE, obj_path=path)
    return with_resolution(scene, 48, 48)


def test_mesh_scene_loads(mesh_scene):
    assert mesh_scene.mesh is not None
    assert mesh_scene.kd is not None
    # OBJ default material appended after the 6 scene materials
    assert mesh_scene.materials.count == 7
    assert (np.asarray(mesh_scene.mesh.material_id) == 6).all()


def test_render_kd_matches_brute(mesh_scene):
    spp = 8
    img_kd = np.asarray(
        render(mesh_scene, RenderConfig(trace_depth=4, enable_kd=True), spp=spp, seed=0)
    )
    img_brute = np.asarray(
        render(mesh_scene, RenderConfig(trace_depth=4, enable_kd=False), spp=spp, seed=0)
    )
    assert np.isfinite(img_kd).all()
    # Same RNG stream; images differ only where the two intersectors
    # tie-break shared-edge hits differently, which decorrelates a few
    # whole paths (chaotic amplification) — bound the damage.
    diff = np.abs(img_kd - img_brute)
    assert diff.mean() < 0.01, f"KD vs brute mean diff {diff.mean()}"
    assert (diff.max(axis=-1) > 0.05).mean() < 0.02  # <2% of pixels diverge


def test_first_hit_kd_equals_brute(mesh_scene):
    """Deterministic check: identical nearest hit on all camera rays."""
    import jax

    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.traverse import intersect_mesh_kd
    from kdtreepathtraceroptimization_tpu.ops.intersect import BIG

    cfg = RenderConfig()
    rays = generate_rays(
        mesh_scene.camera, cfg, bounce_key(jax.random.PRNGKey(0), 1, 0), 8
    )
    brute = intersect_mesh_brute(rays.origin, rays.direction, mesh_scene.mesh)
    kdh = intersect_mesh_kd(rays.origin, rays.direction, mesh_scene.kd, cfg)
    bt, kt = np.asarray(brute.t), np.asarray(kdh.t)
    np.testing.assert_array_equal(bt < BIG, kt < BIG)
    hits = bt < BIG
    np.testing.assert_allclose(kt[hits], bt[hits], rtol=1e-4, atol=1e-4)


def test_render_skiplink_matches_shortstack(mesh_scene):
    a = np.asarray(
        render(
            mesh_scene,
            RenderConfig(trace_depth=4, enable_kd=True, short_stack=True),
            spp=4,
            seed=0,
        )
    )
    b = np.asarray(
        render(
            mesh_scene,
            RenderConfig(trace_depth=4, enable_kd=True, short_stack=False),
            spp=4,
            seed=0,
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_mesh_visible_in_image(mesh_scene):
    img = np.asarray(
        render(mesh_scene, RenderConfig(trace_depth=4), spp=16, seed=0)
    )
    # the ball (diffuse white) occludes the back wall in the center;
    # just check the render is structured and finite
    assert np.isfinite(img).all()
    assert img.max() > 0.1


def test_first_hit_packet_equals_per_ray(mesh_scene):
    """Packet traversal must find the same nearest hit as the per-ray
    fat-row walk (same tree, same nearest-hit min; packets only change
    the visit schedule)."""
    import jax

    from kdtreepathtraceroptimization_tpu.ops.camera import generate_rays
    from kdtreepathtraceroptimization_tpu.ops.rng import bounce_key
    from kdtreepathtraceroptimization_tpu.ops.traverse import intersect_mesh_kd
    from kdtreepathtraceroptimization_tpu.ops.intersect import BIG

    rays = generate_rays(
        mesh_scene.camera, RenderConfig(), bounce_key(jax.random.PRNGKey(0), 1, 0), 8
    )
    base = intersect_mesh_kd(
        rays.origin, rays.direction, mesh_scene.kd, RenderConfig()
    )
    pk = intersect_mesh_kd(
        rays.origin, rays.direction, mesh_scene.kd, RenderConfig(packet_size=32)
    )
    bt, pt = np.asarray(base.t), np.asarray(pk.t)
    np.testing.assert_array_equal(bt < BIG, pt < BIG)
    hits = bt < BIG
    np.testing.assert_allclose(pt[hits], bt[hits], rtol=1e-5, atol=1e-5)


def test_render_packet_matches_default(mesh_scene):
    a = np.asarray(
        render(mesh_scene, RenderConfig(trace_depth=4, packet_size=64), spp=4, seed=0)
    )
    b = np.asarray(
        render(mesh_scene, RenderConfig(trace_depth=4), spp=4, seed=0)
    )
    np.testing.assert_allclose(a, b, atol=1e-3)

"""Scene parser tests (reference format: scene.cpp:7-271)."""

import numpy as np

from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
from kdtreepathtraceroptimization_tpu.scene.structs import GEOM_CUBE, GEOM_SPHERE


def test_cornell_materials(cornell_scene):
    m = cornell_scene.materials
    assert m.count == 6
    assert m.emittance[0] == 5.0
    np.testing.assert_allclose(m.color[1], [0.98, 0.98, 0.98])
    np.testing.assert_allclose(m.color[2], [0.85, 0.35, 0.35])
    assert m.has_reflective[4] == 1.0
    assert m.has_refractive[5] == 1.0
    assert m.index_of_refraction[5] == 1.52


def test_cornell_camera(cornell_scene):
    cam = cornell_scene.camera
    assert tuple(cam.resolution) == (800, 800)
    np.testing.assert_allclose(cam.position, [0.0, 5.0, 10.5])
    np.testing.assert_allclose(cam.view, [0.0, 0.0, -1.0], atol=1e-6)
    # FOVY treated as half-angle: yscaled = tan(45deg) = 1
    np.testing.assert_allclose(cam.pixel_length, [2.0 / 800, 2.0 / 800], rtol=1e-5)
    assert cornell_scene.state.iterations == 5000
    assert cornell_scene.state.trace_depth == 8
    assert cornell_scene.state.image_name == "cornell"


def test_cornell_geoms(cornell_scene):
    g = cornell_scene.geoms
    assert g.count == 6
    assert all(t == GEOM_CUBE for t in g.type)
    # light cube translate (0,10,0) scale (3,.3,3)
    np.testing.assert_allclose(g.transform[0][:3, 3], [0, 10, 0])
    np.testing.assert_allclose(np.diag(g.transform[0])[:3], [3, 0.3, 3])
    # inverse actually inverts
    ident = g.transform[2] @ g.inverse_transform[2]
    np.testing.assert_allclose(ident, np.eye(4), atol=1e-5)


def test_camera_basis_orthonormal(cornell_scene):
    cam = cornell_scene.camera
    assert abs(np.dot(cam.view, cam.right)) < 1e-6
    assert abs(np.dot(cam.view, cam.up)) < 1e-6
    assert abs(np.dot(cam.right, cam.up)) < 1e-6


def test_with_resolution(cornell_scene):
    s2 = with_resolution(cornell_scene, 128, 64)
    assert tuple(s2.camera.resolution) == (128, 64)
    # pixel_length must be recomputed
    np.testing.assert_allclose(
        s2.camera.pixel_length[1], 2.0 * np.tan(np.deg2rad(45.0)) / 64, rtol=1e-5
    )


def test_sphere_objects():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell_spheres.txt")
    s = load_scene(path)
    assert s.geoms.count == 8
    assert s.geoms.type[6] == GEOM_SPHERE
    assert s.geoms.material_id[7] == 5


def test_parses_every_reference_scene_file():
    """Keyword compatibility: every scene file shipped with the
    reference (scenes/*.txt, parsed by scene.cpp:7-271) loads."""
    import glob
    import os

    import pytest

    ref = "/root/reference/scenes"
    if not os.path.isdir(ref):
        pytest.skip("reference scenes not mounted")
    paths = sorted(glob.glob(os.path.join(ref, "*.txt")))
    assert paths
    for p in paths:
        s = load_scene(p)
        assert s.camera.resolution[0] > 0
        assert s.materials.color.shape[0] > 0


def test_repo_scene_variants_load_and_render():
    import os

    base = os.path.join(os.path.dirname(__file__), "..", "scenes")
    for name in ("cornell_duolight.txt", "sphere.txt"):
        s = load_scene(os.path.join(base, name))
        assert s.geoms.count >= 1


def test_scene_writer_roundtrip():
    """write_scene -> parse == original SoA (tools/scene_writer.py), for
    every repo scene file — the repo ships first-party re-emissions of
    all 13 reference scenes."""
    import glob
    import io
    import os

    import numpy as np

    from kdtreepathtraceroptimization_tpu.tools.scene_writer import write_scene
    from kdtreepathtraceroptimization_tpu.scene.parser import parse_scene_text

    scene_dir = os.path.join(os.path.dirname(__file__), "..", "scenes")
    paths = sorted(glob.glob(os.path.join(scene_dir, "*.txt")))
    assert len(paths) >= 13, "repo must ship all reference scene equivalents"
    for p in paths:
        s = load_scene(p)
        buf = io.StringIO()
        write_scene(s, buf)
        s2 = parse_scene_text(buf.getvalue())
        np.testing.assert_allclose(s2.materials.color, s.materials.color,
                                   rtol=1e-6)
        np.testing.assert_allclose(s2.materials.emittance,
                                   s.materials.emittance, rtol=1e-6)
        np.testing.assert_allclose(s2.geoms.transform, s.geoms.transform,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(s2.camera.position, s.camera.position,
                                   rtol=1e-6)
        assert s2.geoms.count == s.geoms.count
        assert s2.state.iterations == s.state.iterations

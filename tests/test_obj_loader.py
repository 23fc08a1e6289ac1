"""OBJ/MTL loader tests (replaces tiny_obj_loader, reference: objmesh.cpp)."""

import os

import numpy as np

from kdtreepathtraceroptimization_tpu.scene.obj_loader import load_mtl, load_obj, parse_obj
from tests.meshutil import icosphere, write_obj


def test_load_generated_sphere(tmp_path):
    verts, faces = icosphere(1, radius=2.0, center=(1, 2, 3))
    path = str(tmp_path / "sphere.obj")
    write_obj(path, verts, faces)
    mesh, mats = load_obj(path, material_offset=6)
    assert mesh.count == len(faces)
    # pre-gathered vertices match
    np.testing.assert_allclose(mesh.v0, verts[faces[:, 0]])
    # default material applied at the offset
    assert (np.asarray(mesh.material_id) == 6).all()
    # normals normalized
    np.testing.assert_allclose(np.linalg.norm(mesh.n0, axis=1), 1.0, atol=1e-5)
    # shape bbox wraps the mesh
    assert (mesh.shape_bbox_min[0] <= verts.min(axis=0) + 1e-6).all()
    assert (mesh.shape_bbox_max[0] >= verts.max(axis=0) - 1e-6).all()


def test_mtl_parsing_and_illum(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text(
        "newmtl diffuse\nKd 0.5 0.4 0.3\nillum 2\n"
        "newmtl mirror\nKd 0.9 0.9 0.9\nKs 1 1 1\nillum 3\n"
        "newmtl glass\nKd 1 1 1\nKs 1 1 1\nNi 1.5\nillum 7\nTf 0.2 0.3 0.4\n"
    )
    mats = load_mtl(str(mtl))
    assert mats["glass"].ior == 1.5
    assert mats["glass"].transmittance == (0.2, 0.3, 0.4)

    obj = tmp_path / "tri.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "usemtl diffuse\nf 1 2 3\n"
        "usemtl mirror\nf 2 4 3\n"
        "usemtl glass\nf 1 3 4\n"
    )
    mesh, soa = load_obj(str(obj), material_offset=0)
    assert soa.count == 3
    # illum mapping (reference scene.cpp:716-807)
    assert soa.has_reflective[0] == 0.0  # diffuse
    assert soa.has_reflective[1] == 1.0 and soa.has_refractive[1] == 0.0  # mirror
    assert soa.has_refractive[2] == 1.0 and soa.index_of_refraction[2] == 1.5
    np.testing.assert_allclose(soa.transmittance[2], [0.2, 0.3, 0.4])
    # per-face material assignment
    np.testing.assert_array_equal(np.asarray(mesh.material_id), [0, 1, 2])


def test_quad_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    data = parse_obj(str(obj))
    assert data.tri_v.shape == (2, 3)
    np.testing.assert_array_equal(data.tri_v, [[0, 1, 2], [0, 2, 3]])


def test_negative_indices(tmp_path):
    obj = tmp_path / "neg.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    data = parse_obj(str(obj))
    np.testing.assert_array_equal(data.tri_v, [[0, 1, 2]])


def test_missing_normals_get_face_normals(tmp_path):
    obj = tmp_path / "nonorm.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    mesh, _ = load_obj(str(obj))
    np.testing.assert_allclose(mesh.n0[0], [0, 0, 1], atol=1e-6)

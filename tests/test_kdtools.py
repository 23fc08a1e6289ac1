"""KD inspection/interchange tooling (reference: KDtree.cpp:59-141)."""

import io

import numpy as np

from kdtreepathtraceroptimization_tpu.accel.kdtree import build_kdtree
from kdtreepathtraceroptimization_tpu.accel.kdtools import (
    print_tree,
    read_triangles_file,
    tree_stats,
    write_kd_to_file,
)
from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere


def _kd(subdiv=2):
    verts, faces = icosphere(subdiv)
    tris = verts[faces]
    return build_kdtree(tris[:, 0], tris[:, 1], tris[:, 2]), tris


def test_write_kd_roundtrip_format(tmp_path):
    kd, _ = _kd()
    path = str(tmp_path / "boxes.txt")
    write_kd_to_file(kd, path)
    rows = np.loadtxt(path)
    assert rows.shape == (kd.nodes.count, 6)
    # pre-order: row 0 is the root bbox, which contains everything
    np.testing.assert_allclose(rows[0, :3], kd.nodes.bbox_min[0], rtol=1e-5)
    assert (rows[:, :3] <= rows[:, 3:] + 1e-6).all()


def test_write_kd_to_stream():
    kd, _ = _kd(1)
    buf = io.StringIO()
    write_kd_to_file(kd, buf)
    assert len(buf.getvalue().splitlines()) == kd.nodes.count


def test_read_triangles_file(tmp_path):
    _, tris = _kd(1)
    path = str(tmp_path / "tris.txt")
    with open(path, "w") as f:
        for t in tris:
            for v in t:
                for c in v:
                    f.write(f"{c}\n")
    back = read_triangles_file(path)
    np.testing.assert_allclose(back, tris, rtol=1e-6)


def test_tree_stats():
    kd, tris = _kd()
    s = tree_stats(kd)
    assert s["source_tris"] == tris.shape[0]
    assert s["leaf_tris_total"] >= s["source_tris"]  # duplication >= 1
    assert s["nodes"] >= s["leaves"] > 0
    assert s["duplication_factor"] >= 1.0


def test_print_tree_shape():
    kd, _ = _kd(1)
    s = print_tree(kd, max_nodes=16)
    lines = s.splitlines()
    assert lines[0].startswith(("node#0", "leaf#0"))
    assert len(lines) <= 17

"""Native (C++) KD builder must produce byte-identical arrays to the
numpy builder (same algorithm, same layout)."""

import numpy as np
import pytest

from kdtreepathtraceroptimization_tpu.accel.kdtree import build_kdtree, validate_kdtree
from kdtreepathtraceroptimization_tpu.accel.native import load_native
from tests.meshutil import icosphere


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    a = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    b = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return a, b, d


@pytest.fixture(scope="module")
def native_available():
    if load_native() is None:
        pytest.skip("native builder unavailable (no g++?)")


def test_native_matches_numpy(native_available):
    a, b, c = _soup(700)
    kd_py = build_kdtree(a, b, c, leaf_size=4, backend="numpy")
    kd_cc = build_kdtree(a, b, c, leaf_size=4, backend="native")
    for f_py, f_cc, name in zip(kd_py.nodes, kd_cc.nodes, kd_py.nodes._fields):
        np.testing.assert_array_equal(f_py, f_cc, err_msg=f"nodes.{name}")
    np.testing.assert_array_equal(kd_py.tris.orig_index, kd_cc.tris.orig_index)
    np.testing.assert_array_equal(kd_py.tris.v0, kd_cc.tris.v0)
    assert kd_py.max_depth == kd_cc.max_depth
    np.testing.assert_array_equal(kd_py.root_bbox_min, kd_cc.root_bbox_min)
    validate_kdtree(kd_cc, 700)


def test_native_matches_numpy_sphere_mesh(native_available):
    verts, faces = icosphere(3, radius=2.0)
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    kd_py = build_kdtree(v0, v1, v2, backend="numpy")
    kd_cc = build_kdtree(v0, v1, v2, backend="native")
    for f_py, f_cc, name in zip(kd_py.nodes, kd_cc.nodes, kd_py.nodes._fields):
        np.testing.assert_array_equal(f_py, f_cc, err_msg=f"nodes.{name}")
    np.testing.assert_array_equal(kd_py.tris.orig_index, kd_cc.tris.orig_index)


def test_native_build_speed_real_mesh(native_available):
    import time

    verts, faces = icosphere(5, radius=2.0)  # 20480 tris
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    t0 = time.perf_counter()
    kd_cc = build_kdtree(v0, v1, v2, backend="native")
    t_native = time.perf_counter() - t0
    validate_kdtree(kd_cc, len(faces))
    print(f"native build of {len(faces)} tris: {t_native*1e3:.1f} ms, "
          f"{kd_cc.nodes.count} nodes, {kd_cc.tris.count} leaf tris")
    assert t_native < 10.0


def test_bad_split_guard_bounds_duplication():
    # heavily overlapping soup must not explode the tree
    a, b, c = _soup(5000, seed=3)
    kd = build_kdtree(a, b, c, backend="numpy")
    validate_kdtree(kd, 5000)
    real = int((kd.tris.orig_index >= 0).sum())  # exclude pad slots
    assert real < 5000 * 20, f"duplication blowup: {real}"

"""KD-tree build + traversal property tests.

The reference's de-facto oracle was image-diffing two traversal modes
(SURVEY.md §4); here that becomes a direct property test: KD traversal
must agree with brute force on random rays over random triangle soups.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kdtreepathtraceroptimization_tpu.accel.kdtree import (
    build_kdtree,
    validate_kdtree,
)
from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute
from kdtreepathtraceroptimization_tpu.ops.traverse import (
    traverse_pushdown,
    traverse_shortstack,
    traverse_skiplink,
)
from kdtreepathtraceroptimization_tpu.scene.structs import MeshSoA


def _random_soup(rng, n_tris, spread=4.0, size=0.6):
    centers = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    a = centers + rng.uniform(-size, size, (n_tris, 3)).astype(np.float32)
    b = centers + rng.uniform(-size, size, (n_tris, 3)).astype(np.float32)
    c = centers + rng.uniform(-size, size, (n_tris, 3)).astype(np.float32)
    return a, b, c


def _mesh_from_soup(a, b, c):
    n = a.shape[0]
    fn = np.cross(b - a, c - a)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    pts = np.concatenate([a, b, c], axis=0)
    return MeshSoA(
        v0=a, v1=b, v2=c, n0=fn, n1=fn, n2=fn,
        material_id=np.zeros(n, np.int32),
        shape_id=np.zeros(n, np.int32),
        shape_bbox_min=pts.min(axis=0, keepdims=True),
        shape_bbox_max=pts.max(axis=0, keepdims=True),
    )


def _random_rays(rng, n_rays, spread=8.0):
    o = rng.uniform(-spread, spread, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_invariants():
    rng = np.random.default_rng(0)
    a, b, c = _random_soup(rng, 500)
    kd = build_kdtree(a, b, c, leaf_size=4)
    validate_kdtree(kd, 500)
    # duplication means >= source count
    assert kd.tris.count >= 500
    assert kd.nodes.count >= 3


def test_build_tiny_and_degenerate():
    rng = np.random.default_rng(1)
    a, b, c = _random_soup(rng, 3)
    kd = build_kdtree(a, b, c, leaf_size=4)
    validate_kdtree(kd, 3)
    # single leaf tree: root is the leaf
    assert kd.nodes.axis[0] == -1

    # identical triangles (unsplittable -> no-progress guard)
    one = np.tile(a[:1], (20, 1))
    kd2 = build_kdtree(one, np.tile(b[:1], (20, 1)), np.tile(c[:1], (20, 1)))
    validate_kdtree(kd2, 20)


@pytest.mark.parametrize("traverse", [traverse_skiplink, traverse_shortstack, traverse_pushdown])
def test_traversal_matches_brute_force(traverse):
    rng = np.random.default_rng(42)
    a, b, c = _random_soup(rng, 300)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c, leaf_size=4)
    validate_kdtree(kd, 300)
    o, d = _random_rays(rng, 512)
    cfg = RenderConfig()

    brute = jax.jit(lambda o, d: intersect_mesh_brute(o, d, mesh, use_bbox=False))(o, d)
    kdh = jax.jit(lambda o, d: traverse(o, d, kd, cfg))(o, d)

    bt = np.asarray(brute.t)
    kt = np.asarray(kdh.t)
    hit_b = bt < BIG
    hit_k = kt < BIG
    np.testing.assert_array_equal(hit_b, hit_k)
    np.testing.assert_allclose(kt[hit_k], bt[hit_b], rtol=1e-4, atol=1e-4)
    # winning triangle (by original index) matches wherever the brute
    # winner is unique; allow ties by comparing t only (already done) and
    # checking the KD winner maps to a real source triangle.
    orig = np.asarray(kd.tris.orig_index)[np.asarray(kdh.tri)[hit_k]]
    assert (orig >= 0).all() and (orig < 300).all()


@pytest.mark.parametrize("traverse", [traverse_skiplink, traverse_shortstack, traverse_pushdown])
def test_traversal_inside_cluster(traverse):
    # rays starting inside the geometry cluster (origin-inside-AABB paths)
    rng = np.random.default_rng(7)
    a, b, c = _random_soup(rng, 200, spread=2.0)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c)
    o = jnp.zeros((64, 3), jnp.float32)
    d_np = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
    cfg = RenderConfig()
    brute = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    kdh = traverse(o, d, kd, cfg)
    np.testing.assert_allclose(
        np.asarray(kdh.t), np.asarray(brute.t), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("stack_k", [2, 3])
def test_pushdown_overflow_recovery(stack_k):
    """Force short-stack overflow and check the Horn oldest-drop
    eviction + push-down restart still matches brute force.

    A deep tree (leaf_size=2, 6000 tris) with pushdown_stack=2 makes
    almost every ray evict entries; before the oldest-drop fix this
    produced hundreds of wrong nearest hits (advisor r4, high)."""
    rng = np.random.default_rng(3)
    a, b, c = _random_soup(rng, 6000, spread=6.0, size=0.4)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c, leaf_size=2)
    o, d = _random_rays(rng, 1024)
    cfg = RenderConfig(pushdown_stack=stack_k, max_traversal_steps=65536)

    brute = jax.jit(lambda o, d: intersect_mesh_brute(o, d, mesh, use_bbox=False))(o, d)
    kdh = jax.jit(lambda o, d: traverse_pushdown(o, d, kd, cfg))(o, d)

    bt = np.asarray(brute.t)
    kt = np.asarray(kdh.t)
    np.testing.assert_array_equal(bt < BIG, kt < BIG)
    hit = bt < BIG
    np.testing.assert_allclose(kt[hit], bt[hit], rtol=1e-4, atol=1e-4)


def test_traversal_big_leaf_chunking():
    # leaf_chunk smaller than leaf sizes exercises the cursor path
    rng = np.random.default_rng(3)
    a, b, c = _random_soup(rng, 128)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c, leaf_size=64, max_depth=2)
    o, d = _random_rays(rng, 128)
    cfg = RenderConfig(leaf_chunk=4)
    brute = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    for trav in (traverse_skiplink, traverse_shortstack, traverse_pushdown):
        kdh = trav(o, d, kd, cfg)
        np.testing.assert_allclose(
            np.asarray(kdh.t), np.asarray(brute.t), rtol=1e-4, atol=1e-4
        )


# ---------------------------------------------------------------------------
# Fat-row traversal (the TPU production path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("short_stack", [False, True])
@pytest.mark.parametrize("tiles", [1, 4])
def test_fatrow_matches_brute_force(short_stack, tiles):
    from kdtreepathtraceroptimization_tpu.ops.traverse import traverse_fatrow

    rng = np.random.default_rng(42)
    a, b, c = _random_soup(rng, 300)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c, leaf_size=4)
    assert kd.fat is not None
    o, d = _random_rays(rng, 512)
    # tile_lanes sized to force exactly `tiles` tiles over 512 rays
    cfg = RenderConfig(short_stack=short_stack, tile_lanes=512 // tiles,
                       traversal_tiles=tiles)

    brute = jax.jit(lambda o, d: intersect_mesh_brute(o, d, mesh, use_bbox=False))(o, d)
    kdh = jax.jit(lambda o, d: traverse_fatrow(o, d, kd, cfg))(o, d)

    bt, kt = np.asarray(brute.t), np.asarray(kdh.t)
    hit_b, hit_k = bt < BIG, kt < BIG
    np.testing.assert_array_equal(hit_b, hit_k)
    np.testing.assert_allclose(kt[hit_k], bt[hit_b], rtol=1e-4, atol=1e-4)
    orig = np.asarray(kd.tris.orig_index)[np.asarray(kdh.tri)[hit_k]]
    assert (orig >= 0).all() and (orig < 300).all()


@pytest.mark.parametrize("short_stack", [False, True])
def test_fatrow_big_leaves_continuation_chain(short_stack):
    # leaves far larger than the inline cap exercise continuation rows
    from kdtreepathtraceroptimization_tpu.ops.traverse import traverse_fatrow

    rng = np.random.default_rng(3)
    a, b, c = _random_soup(rng, 128)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c, leaf_size=64, max_depth=2)
    assert kd.fat.count > kd.nodes.count  # chains actually exist
    o, d = _random_rays(rng, 128)
    cfg = RenderConfig(short_stack=short_stack)
    brute = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    kdh = traverse_fatrow(o, d, kd, cfg)
    np.testing.assert_allclose(
        np.asarray(kdh.t), np.asarray(brute.t), rtol=1e-4, atol=1e-4
    )


def test_fatrow_t_init_and_active():
    from kdtreepathtraceroptimization_tpu.ops.traverse import traverse_fatrow

    rng = np.random.default_rng(9)
    a, b, c = _random_soup(rng, 200)
    mesh = _mesh_from_soup(a, b, c)
    kd = build_kdtree(a, b, c)
    o, d = _random_rays(rng, 256)
    cfg = RenderConfig()
    brute = intersect_mesh_brute(o, d, mesh, use_bbox=False)
    bt = np.asarray(brute.t)

    # active=False lanes report miss and never traverse
    active = jnp.asarray(np.arange(256) % 2 == 0)
    kdh = traverse_fatrow(o, d, kd, cfg, active=active)
    kt = np.asarray(kdh.t)
    assert (kt[1::2] >= BIG).all()
    hit = kt[::2] < BIG
    np.testing.assert_allclose(kt[::2][hit], bt[::2][hit], rtol=1e-4, atol=1e-4)

    # t_init below the true hit distance suppresses the hit (bounded
    # search); above it, the hit is found exactly.
    t_low = jnp.full((256,), 1e-3, jnp.float32)
    kdh_low = traverse_fatrow(o, d, kd, cfg, t_init=t_low)
    assert (np.asarray(kdh_low.t) >= BIG).all()

    t_hi = jnp.asarray(np.where(bt < BIG, bt * 1.5, BIG).astype(np.float32))
    kdh_hi = traverse_fatrow(o, d, kd, cfg, t_init=t_hi)
    hit2 = np.asarray(kdh_hi.t) < BIG
    np.testing.assert_array_equal(hit2, bt < BIG)
    np.testing.assert_allclose(
        np.asarray(kdh_hi.t)[hit2], bt[bt < BIG], rtol=1e-4, atol=1e-4
    )


def test_octant_layout_matches_single_layout():
    """The eight near-first octant layouts must produce identical hits
    to the single pre-order layout (they reorder traversal, never
    change the candidate set)."""
    from kdtreepathtraceroptimization_tpu.ops.traverse import traverse_fatrow

    rng = np.random.default_rng(7)
    a, b, c = _random_soup(rng, 400)
    kd = build_kdtree(a, b, c, leaf_size=4)
    assert kd.oct is not None and kd.oct.layout_size > 0
    o, d = _random_rays(rng, 1024)
    h_oct = traverse_fatrow(o, d, kd, RenderConfig(octant_rows=True))
    h_fat = traverse_fatrow(o, d, kd, RenderConfig(octant_rows=False))
    np.testing.assert_allclose(
        np.asarray(h_oct.t), np.asarray(h_fat.t), rtol=1e-5, atol=1e-5
    )
    # Straddling triangles are duplicated into both children
    # (KDnode.cpp:177-187 semantics), so an exact-t tie can be won by a
    # different COPY depending on visit order — compare source ids.
    orig = np.asarray(kd.tris.orig_index)
    to = np.where(np.asarray(h_oct.tri) >= 0, orig[np.asarray(h_oct.tri)], -1)
    tf = np.where(np.asarray(h_fat.tri) >= 0, orig[np.asarray(h_fat.tri)], -1)
    np.testing.assert_array_equal(to, tf)

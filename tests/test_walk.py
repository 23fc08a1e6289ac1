"""Exact entry-ordered walk intersector (ops/walk.py) correctness.

Oracle chain as for ops/cluster.py: walk vs brute on first hits,
interpret-mode Pallas vs jnp reference, slab-cull conservativeness,
t_init/active masking, shard-local equivalence, and a full render diff
against the KD path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.cluster import build_cluster_mesh
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute
from kdtreepathtraceroptimization_tpu.ops.walk import (
    _full_select,
    _ray16,
    _slab_cull_ref,
    intersect_mesh_walk,
)

from tests.test_cluster import _mesh, _rays


def test_slab_cull_is_conservative():
    """Every true triangle hit lies inside some feasible block at an
    entry bound <= the hit t."""
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(2048, seed=1)
    hit = intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                               use_bbox=False)
    t = np.asarray(hit.t)
    tri = np.asarray(hit.tri)
    ok = t < 1e30

    oc = jnp.asarray(o) - cm.center_shift
    x = _ray16(oc, jnp.asarray(d), jnp.full((2048,), 1e30, jnp.float32),
               jnp.ones((2048,), jnp.float32))
    # per-RAY entries (tile=1 degenerate via reshape)
    entry = np.asarray(_slab_cull_ref(x, cm.slab, cm.blk, 1))
    # the hit triangle's block must be feasible with entry <= t_hit.
    # brute tri ids index the ORIGINAL mesh; map via vertex identity:
    # instead just check: some feasible block has entry <= t_hit
    has = (entry[ok] <= t[ok][:, None] * (1 + 1e-5) + 1e-4).any(axis=1)
    assert has.all()


def test_full_select_orders_and_counts():
    te = jnp.asarray([[3.0, 1e31, 1.0, 2.0],
                      [1e31, 1e31, 1e31, 1e31]], jnp.float32)
    sel, lb, nsel = _full_select(te)
    sel, lb, nsel = np.asarray(sel), np.asarray(lb), np.asarray(nsel)
    assert nsel.ravel().tolist() == [3, 0]
    assert sel[0].tolist() == [2, 3, 0, 0]  # entry order, tail repeats
    assert np.isfinite(lb[0][:3]).all() and lb[0][3] >= 1e30
    assert (lb[1] >= 1e30).all()


@pytest.mark.parametrize("tile", [256, 512])
def test_walk_matches_brute(tile):
    mesh = _mesh(3)  # 1280 tris
    cm = build_cluster_mesh(mesh, block=64)  # 20 blocks
    o, d = _rays(4096)
    config = RenderConfig(cluster=True, cluster_walk=True, cluster_tile=tile)
    hit_c = jax.jit(
        lambda o, d: intersect_mesh_walk(o, d, cm, config)
    )(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                                          use_bbox=False)
    )(o, d)
    t_c, t_b = np.asarray(hit_c.t), np.asarray(hit_b.t)
    miss_c, miss_b = t_c >= 1e30, t_b >= 1e30
    assert (miss_c == miss_b).all(), f"{(miss_c != miss_b).sum()} hit/miss diffs"
    np.testing.assert_allclose(t_c[~miss_c], t_b[~miss_b], rtol=2e-4, atol=2e-4)


def test_walk_pallas_interpret_matches_ref():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(1024, seed=3)
    config = RenderConfig(cluster=True, cluster_walk=True, cluster_tile=256)
    hit_i = intersect_mesh_walk(o, d, cm, config, interpret=True)
    hit_r = intersect_mesh_walk(o, d, cm, config)
    np.testing.assert_allclose(np.asarray(hit_i.t), np.asarray(hit_r.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hit_i.tri), np.asarray(hit_r.tri))


def test_walk_t_init_and_active_masking():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=5)
    config = RenderConfig(cluster=True, cluster_walk=True, cluster_tile=256)
    t_init = jnp.full((512,), 1e-3, jnp.float32)
    bounded = intersect_mesh_walk(o, d, cm, config, t_init=t_init)
    assert (np.asarray(bounded.t) >= 1e30).all()
    act = jnp.zeros((512,), bool)
    dead = intersect_mesh_walk(o, d, cm, config, active=act)
    assert (np.asarray(dead.t) >= 1e30).all()


def test_walk_shards_match_unsharded():
    mesh = _mesh(3)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(2048, seed=9)
    cfg1 = RenderConfig(cluster=True, cluster_walk=True, cluster_tile=256)
    cfg4 = RenderConfig(cluster=True, cluster_walk=True, cluster_tile=256,
                        binned_shards=4)
    h1 = intersect_mesh_walk(o, d, cm, cfg1)
    h4 = intersect_mesh_walk(o, d, cm, cfg4)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h4.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h4.tri))


def test_walk_render_matches_kd():
    import os
    import tempfile

    from kdtreepathtraceroptimization_tpu.render.integrator import render
    from kdtreepathtraceroptimization_tpu.scene.parser import (
        load_scene, with_resolution,
    )
    from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj

    verts, faces = icosphere(2, radius=2.5, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene_path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                              "cornell.txt")
    scene = with_resolution(
        load_scene(scene_path, obj_path=tmp.name), 48, 48
    )
    spp = 8
    img_kd = np.asarray(render(scene, RenderConfig(trace_depth=4), spp=spp,
                               seed=0))
    img_w = np.asarray(render(
        scene,
        RenderConfig(trace_depth=4, cluster=True, cluster_walk=True,
                     cluster_pairs=False, cluster_tile=256),
        spp=spp, seed=0,
    ))
    diff = np.abs(img_kd - img_w)
    assert diff.mean() < 0.01, f"walk vs kd mean diff {diff.mean()}"

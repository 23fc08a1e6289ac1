"""Binned cluster intersector (ops/binned.py) correctness.

Oracle chain as for ops/cluster.py (tests/test_cluster.py): binned vs
brute on first hits, interpret-mode Pallas vs jnp reference, repair
exactness under a tiny round budget, bin-rank properties, and a full
render diff against the KD path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.binned import (
    _argmin_ref,
    _bin_rank,
    intersect_mesh_binned,
)
from kdtreepathtraceroptimization_tpu.ops.cluster import build_cluster_mesh
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute

from tests.test_cluster import _mesh, _rays


def test_bin_rank_is_stable_counting_sort():
    bins = jnp.asarray([3, 1, 3, 0, 1, 1, 4, 0], jnp.int32)
    rank, perm = _bin_rank(bins)
    rank = np.asarray(rank).ravel()
    perm = np.asarray(perm).ravel()
    # perm gathers into sorted order; rank is its inverse
    b = np.asarray(bins)
    assert (np.sort(b) == b[perm]).all()
    assert (rank[perm] == np.arange(8)).all()
    # stability: equal bins keep original relative order
    for v in np.unique(b):
        idx = np.where(b == v)[0]
        assert (np.diff(rank[idx]) > 0).all()


def test_bin_rank_shard_local():
    """shards=2: each row sorts independently with row-local indices."""
    rng = np.random.default_rng(0)
    bins = jnp.asarray(rng.integers(0, 7, 32).astype(np.int32))
    rank, perm = _bin_rank(bins, shards=2)
    rank, perm = np.asarray(rank), np.asarray(perm)
    b = np.asarray(bins).reshape(2, 16)
    for s in range(2):
        assert (np.sort(b[s]) == b[s][perm[s]]).all()
        assert (rank[s][perm[s]] == np.arange(16)).all()


def test_binned_shards_match_unsharded():
    """The shard-local pipeline gives identical hits to shards=1."""
    mesh = _mesh(3)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(2048, seed=9)
    cfg1 = RenderConfig(cluster=True, cluster_binned=True,
                        cluster_tile=256, binned_rounds=4)
    cfg4 = RenderConfig(cluster=True, cluster_binned=True,
                        cluster_tile=256, binned_rounds=4, binned_shards=4)
    h1 = intersect_mesh_binned(o, d, cm, cfg1)
    h4 = intersect_mesh_binned(o, d, cm, cfg4)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h4.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h4.tri))


def test_argmin_bins_match_entry_order():
    """The per-ray argmin bin equals the first block of the per-ray
    entry-ordered feasible list (or kp when none feasible)."""
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=11)
    o = o - cm.center_shift
    t0 = jnp.full((512,), 1e30, jnp.float32)
    act = jnp.ones((512, 1), jnp.float32)
    x = jnp.concatenate([o, d, t0[:, None], act], axis=1)
    bins = np.asarray(_argmin_ref(x, cm.cull_w, cm.blk))
    kp = cm.n_blocks
    # recompute entries densely
    from kdtreepathtraceroptimization_tpu.ops.cluster import _entry_math
    prod = x @ cm.cull_w
    entry = np.asarray(_entry_math(
        x[:, 0:3], x[:, 3:6], x[:, 6:7], x[:, 7:8] > 0.0,
        cm.blk[3:4, :], cm.blk[4:5, :], cm.blk[5:6, :],
        prod[:, :kp], prod[:, kp:],
    ))
    has = np.isfinite(entry).any(1) & (entry.min(1) < 1e30)
    assert (bins[~has] == kp).all()
    np.testing.assert_array_equal(bins[has], entry[has].argmin(1))


@pytest.mark.parametrize("rounds", [2, 32])
def test_binned_matches_brute(rounds):
    mesh = _mesh(3)  # 1280 tris
    cm = build_cluster_mesh(mesh, block=64)  # 20 blocks
    o, d = _rays(4096)
    config = RenderConfig(cluster=True, cluster_binned=True,
                          cluster_tile=512, binned_rounds=rounds)
    hit_c = jax.jit(
        lambda o, d: intersect_mesh_binned(o, d, cm, config)
    )(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                                          use_bbox=False)
    )(o, d)
    t_c, t_b = np.asarray(hit_c.t), np.asarray(hit_b.t)
    miss_c, miss_b = t_c >= 1e30, t_b >= 1e30
    assert (miss_c == miss_b).all(), f"{(miss_c != miss_b).sum()} hit/miss diffs"
    np.testing.assert_allclose(t_c[~miss_c], t_b[~miss_b], rtol=2e-4, atol=2e-4)


def test_binned_repair_fires_and_is_exact():
    mesh = _mesh(3)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(2048, seed=7)
    config = RenderConfig(cluster=True, cluster_binned=True,
                          cluster_tile=256, binned_rounds=1)
    hit_c = jax.jit(lambda o, d: intersect_mesh_binned(o, d, cm, config))(o, d)
    hit_b = intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                                 use_bbox=False)
    t_c, t_b = np.asarray(hit_c.t), np.asarray(hit_b.t)
    miss = t_b >= 1e30
    assert ((t_c >= 1e30) == miss).all()
    np.testing.assert_allclose(t_c[~miss], t_b[~miss], rtol=2e-4, atol=2e-4)


def test_binned_pallas_interpret_matches_ref():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(1024, seed=3)
    config = RenderConfig(cluster=True, cluster_binned=True,
                          cluster_tile=256, binned_rounds=4)
    hit_i = intersect_mesh_binned(o, d, cm, config, interpret=True)
    hit_r = intersect_mesh_binned(o, d, cm, config)
    np.testing.assert_allclose(np.asarray(hit_i.t), np.asarray(hit_r.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hit_i.tri), np.asarray(hit_r.tri))


def test_binned_t_init_and_active_masking():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=5)
    config = RenderConfig(cluster=True, cluster_binned=True,
                          cluster_tile=256, binned_rounds=8)
    t_init = jnp.full((512,), 1e-3, jnp.float32)
    bounded = intersect_mesh_binned(o, d, cm, config, t_init=t_init)
    assert (np.asarray(bounded.t) >= 1e30).all()
    act = jnp.zeros((512,), bool)
    dead = intersect_mesh_binned(o, d, cm, config, active=act)
    assert (np.asarray(dead.t) >= 1e30).all()


def test_binned_render_matches_kd():
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
    img_cl = np.asarray(render(
        scene,
        RenderConfig(trace_depth=4, cluster=True, cluster_binned=True,
                     cluster_tile=256, binned_rounds=6, cluster_walk=False, cluster_pairs=False),
        spp=spp, seed=0,
    ))
    diff = np.abs(img_kd - img_cl)
    assert diff.mean() < 0.01, f"binned vs kd mean diff {diff.mean()}"

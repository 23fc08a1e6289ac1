"""Cluster-MXU intersector (ops/cluster.py) correctness.

The oracle chain mirrors the reference's de-facto test ("image-diff two
traversal modes", SURVEY.md §4): cluster vs brute on first hits, the
Pallas kernel (interpret mode) vs the jnp round loop, the exactness
repair under adversarially tiny round budgets, and a full render diff.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.cluster import (
    build_cluster_mesh,
    intersect_mesh_cluster,
)
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute
from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere


def _mesh(subdiv=2):
    from kdtreepathtraceroptimization_tpu.scene.structs import MeshSoA

    verts, faces = icosphere(subdiv, radius=2.0, center=(0.3, -0.2, 0.5))
    v = verts[faces]
    t = v.shape[0]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
    return MeshSoA(
        v0=v[:, 0], v1=v[:, 1], v2=v[:, 2],
        n0=n, n1=n, n2=n,
        material_id=np.zeros(t, np.int32),
        shape_id=np.zeros(t, np.int32),
        shape_bbox_min=v.min((0, 1))[None],
        shape_bbox_max=v.max((0, 1))[None],
    )


def _rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 4.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_covers_all_triangles():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    t = mesh.v0.shape[0]
    # every original triangle appears in the block-ordered table;
    # padding slots (kd leaves pad by degenerate duplicates) excluded
    orig = np.stack([mesh.v0, mesh.v1, mesh.v2], 1)
    full = np.stack([np.asarray(cm.tris.v0), np.asarray(cm.tris.v1),
                     np.asarray(cm.tris.v2)], 1)
    degen = (np.abs(full[:, 1] - full[:, 0]).max(1) == 0) & (
        np.abs(full[:, 2] - full[:, 0]).max(1) == 0)
    blocked = full[~degen]
    assert blocked.shape[0] == t
    key = lambda a: set(map(tuple, a.reshape(a.shape[0], -1).round(5).tolist()))
    assert key(orig) == key(blocked)
    # spheres contain their triangles (real blocks only — the block
    # axis is lane-padded with never-feasible sentinels)
    k = cm.n_real_blocks
    b = cm.block
    v = full.reshape(k, b, 3, 3)
    blk = np.asarray(cm.blk)
    c = blk[0:3, :k].T + np.asarray(cm.center_shift)
    r = blk[3, :k]
    d = np.linalg.norm(v - c[:, None, None, :], axis=-1)
    assert (d <= r[:, None, None] + 1e-4).all()


@pytest.mark.parametrize("rounds", [4, 64])
def test_cluster_matches_brute(rounds):
    mesh = _mesh(3)  # 1280 tris
    cm = build_cluster_mesh(mesh, block=64)  # 20 blocks
    o, d = _rays(4096)
    config = RenderConfig(cluster=True, cluster_tile=512,
                          cluster_rounds=rounds)
    hit_c = jax.jit(
        lambda o, d: intersect_mesh_cluster(o, d, cm, config)
    )(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                                          use_bbox=False)
    )(o, d)
    t_c, t_b = np.asarray(hit_c.t), np.asarray(hit_b.t)
    miss_c, miss_b = t_c >= 1e30, t_b >= 1e30
    assert (miss_c == miss_b).all(), f"{(miss_c != miss_b).sum()} hit/miss diffs"
    np.testing.assert_allclose(t_c[~miss_c], t_b[~miss_b], rtol=2e-4, atol=2e-4)


def test_repair_pass_fires_and_is_exact():
    """rounds=1 guarantees unselected feasible blocks remain; the flag +
    repair pass must still produce brute-equal results."""
    mesh = _mesh(3)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(2048, seed=7)
    config = RenderConfig(cluster=True, cluster_tile=256, cluster_rounds=1)
    hit_c = jax.jit(lambda o, d: intersect_mesh_cluster(o, d, cm, config))(o, d)
    hit_b = intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                                 use_bbox=False)
    t_c, t_b = np.asarray(hit_c.t), np.asarray(hit_b.t)
    miss = t_b >= 1e30
    assert ((t_c >= 1e30) == miss).all()
    np.testing.assert_allclose(t_c[~miss], t_b[~miss], rtol=2e-4, atol=2e-4)


def test_pallas_interpret_matches_ref():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(1024, seed=3)
    config = RenderConfig(cluster=True, cluster_tile=256, cluster_rounds=4)
    hit_i = intersect_mesh_cluster(o, d, cm, config, interpret=True)
    hit_r = intersect_mesh_cluster(o, d, cm, config)
    np.testing.assert_allclose(np.asarray(hit_i.t), np.asarray(hit_r.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hit_i.tri), np.asarray(hit_r.tri))


def test_t_init_and_active_masking():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=5)
    config = RenderConfig(cluster=True, cluster_tile=256, cluster_rounds=8)
    base = intersect_mesh_cluster(o, d, cm, config)
    # t_init below every hit -> all misses survive as BIG
    t_init = jnp.full((512,), 1e-3, jnp.float32)
    bounded = intersect_mesh_cluster(o, d, cm, config, t_init=t_init)
    assert (np.asarray(bounded.t) >= 1e30).all()
    # inactive lanes report miss
    act = jnp.zeros((512,), bool)
    dead = intersect_mesh_cluster(o, d, cm, config, active=act)
    assert (np.asarray(dead.t) >= 1e30).all()
    del base


def test_over_cap_scene_falls_back_to_kd(monkeypatch):
    """A mesh past the pair intersector's block-id cap must load with
    cmesh=None and still render correctly through the KD walk
    (scene/parser.py fallback; VERDICT r4 item 3). The cap is
    monkeypatched tiny so a test-sized mesh exercises the real path."""
    import os
    import tempfile

    from kdtreepathtraceroptimization_tpu.ops import pairs as pr
    from kdtreepathtraceroptimization_tpu.render.integrator import render
    from kdtreepathtraceroptimization_tpu.scene.parser import (
        load_scene, with_resolution,
    )
    from kdtreepathtraceroptimization_tpu.utils.procmesh import write_obj

    # 1280 tris beats every fallback block size once the cap is 1 block
    verts, faces = icosphere(3, radius=2.5, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene_path = os.path.join(os.path.dirname(__file__), "..", "scenes",
                              "cornell.txt")
    monkeypatch.setattr(pr, "MAX_CLUSTER_BLOCKS", 1)
    over = with_resolution(load_scene(scene_path, obj_path=tmp.name), 32, 32)
    assert over.cmesh is None, "over-cap scene should skip the cluster table"
    monkeypatch.undo()
    ref = with_resolution(load_scene(scene_path, obj_path=tmp.name), 32, 32)
    assert ref.cmesh is not None

    # The production auto-select config renders identically either way:
    # with no cluster table it takes the KD walk.
    cfg = RenderConfig(trace_depth=2, cluster_auto=True, cluster_min_tris=1)
    img_over = np.asarray(render(over, cfg, spp=4, seed=0))
    img_ref = np.asarray(render(ref, cfg, spp=4, seed=0))
    assert np.isfinite(img_over).all()
    diff = np.abs(img_over - img_ref)
    assert diff.mean() < 0.01, f"fallback render diverged: {diff.mean()}"


def test_cluster_render_matches_kd():
    """Full cornell+mesh render: cluster mode vs KD within noise."""
    import os
    import tempfile

    from kdtreepathtraceroptimization_tpu.render.integrator import render
    from kdtreepathtraceroptimization_tpu.scene.parser import (
        load_scene, with_resolution,
    )
    from kdtreepathtraceroptimization_tpu.utils.procmesh import write_obj

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
        RenderConfig(trace_depth=4, cluster=True, cluster_tile=256,
                     cluster_rounds=6, cluster_walk=False, cluster_pairs=False),
        spp=spp, seed=0,
    ))
    diff = np.abs(img_kd - img_cl)
    assert diff.mean() < 0.01, f"cluster vs kd mean diff {diff.mean()}"

"""Pair-list intersector (ops/pairs.py) correctness.

Oracle chain: extraction vs dense entry matrix, pairs vs brute on
first hits (with pass-2/3 forced by tiny F), interpret-mode Pallas vs
jnp reference, masking, and a full render diff against the KD path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.ops.cluster import build_cluster_mesh
from kdtreepathtraceroptimization_tpu.ops.mesh import intersect_mesh_brute
from kdtreepathtraceroptimization_tpu.ops.pairs import (
    _extract_ref,
    intersect_mesh_pairs,
)
from kdtreepathtraceroptimization_tpu.ops.walk import _ray16, _slab_cull_ref

from tests.test_cluster import _mesh, _rays


def test_extraction_matches_dense_entries():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=11)
    o = o - cm.center_shift
    x = _ray16(o, d, jnp.full((512,), 1e30, jnp.float32),
               jnp.ones((512,), jnp.float32))
    F = 3
    ids, lbov, cnt, feat = _extract_ref(x, cm.slab, cm.blk, F)
    ids, lbov, cnt = np.asarray(ids), np.asarray(lbov), np.asarray(cnt)
    # the feature record carries the epilogue bound in column 10
    np.testing.assert_allclose(np.asarray(feat[:, 10]), np.asarray(x[:, 6]))
    entry = np.asarray(_slab_cull_ref(x, cm.slab, cm.blk, 1))  # per-ray
    kp = cm.n_blocks
    feas = entry < 1e30
    np.testing.assert_array_equal(cnt, feas.sum(1))
    srt = np.argsort(np.where(feas, entry, np.inf), axis=1, kind="stable")
    for i in range(512):
        c = cnt[i]
        want = srt[i, :min(F, c)].tolist() + [kp] * max(0, F - c)
        # ties may reorder equal-entry blocks; compare entry VALUES
        got_e = [entry[i, j] if j < kp else np.inf for j in ids[i]]
        want_e = [entry[i, j] if j < kp else np.inf for j in want]
        np.testing.assert_allclose(got_e, want_e, rtol=1e-6)
        if c > F:
            # lb_over is mantissa-truncated (packed-key selection, 12
            # block-id bits): conservative (never above the exact
            # bound), within 2^-11
            exact = entry[i, srt[i, F]]
            assert lbov[i] <= exact * (1 + 1e-6)
            assert lbov[i] >= exact * (1 - 1.2e-3) - 1e-6
        else:
            assert lbov[i] >= 1e30


def test_pack_unpack_roundtrip_properties():
    from kdtreepathtraceroptimization_tpu.ops.pairs import (
        _PBIG, _pack_tl, _unpack_tl,
    )

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.random(4096).astype(np.float32) * 100.0 + 1e-4)
    loc = jnp.asarray(rng.integers(0, 256, 4096), jnp.int32)
    p = _pack_tl(t, loc)
    tq, lq = _unpack_tl(p)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(loc))
    tqn, tn = np.asarray(tq), np.asarray(t)
    # truncation only LOWERS t, by < 2^-15 relative (proof-conservative)
    assert (tqn <= tn).all()
    assert (tqn >= tn * (1 - 2.0 ** -15)).all()
    # packed order == t order for equal-loc, and misses decode as BIG
    big = jnp.full((4,), 1e30, jnp.float32)
    pb = _pack_tl(big, jnp.arange(4, dtype=jnp.int32))
    tb, _ = _unpack_tl(pb)
    assert (np.asarray(pb) >= _PBIG).all()
    assert (np.asarray(tb) == np.float32(1e30)).all()


def test_extraction_emits_feat16t():
    """The extraction kernel's feature output must equal the reference
    _feat16t construction (incl. the t0-in-column-10 smuggle that rides
    the MT weight matrix's zero rows)."""
    from kdtreepathtraceroptimization_tpu.ops.pairs import (
        _extract_pallas, _feat16t,
    )

    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=13)
    o = o - cm.center_shift
    t0 = jnp.linspace(0.5, 40.0, 512)
    act = (jnp.arange(512) % 3 != 0).astype(jnp.float32)
    x = _ray16(o, d * act[:, None], t0, act)
    ids, lbov, cnt, feat = _extract_pallas(x, cm.slab, cm.blk, 256, 3,
                                           True)  # interpret mode
    want = _feat16t(x[:, :8])
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat[:, 10]), np.asarray(t0),
                               rtol=1e-6)


@pytest.mark.parametrize("F", [1, 2, 8])
def test_pairs_match_brute(F):
    """Tiny F forces pass 2 (and the pass-3 walk for F=1)."""
    mesh = _mesh(3)  # 1280 tris
    cm = build_cluster_mesh(mesh, block=64)  # ~24 kd blocks
    o, d = _rays(4096)
    config = RenderConfig(cluster=True, cluster_pairs=True,
                          cluster_tile=512, pair_slots=F, pair_tile=256)
    hit_c = jax.jit(
        lambda o, d: intersect_mesh_pairs(o, d, cm, config)
    )(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect_mesh_brute(o, d, jax.tree.map(jnp.asarray, mesh),
                                          use_bbox=False)
    )(o, d)
    t_c, t_b = np.asarray(hit_c.t), np.asarray(hit_b.t)
    miss_c, miss_b = t_c >= 1e30, t_b >= 1e30
    assert (miss_c == miss_b).all(), f"{(miss_c != miss_b).sum()} hit/miss diffs"
    np.testing.assert_allclose(t_c[~miss_c], t_b[~miss_b], rtol=2e-4, atol=2e-4)


def test_pairs_pallas_interpret_matches_ref():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(1024, seed=3)
    config = RenderConfig(cluster=True, cluster_pairs=True,
                          cluster_tile=256, pair_slots=4, pair_tile=256)
    hit_i = intersect_mesh_pairs(o, d, cm, config, interpret=True)
    hit_r = intersect_mesh_pairs(o, d, cm, config)
    np.testing.assert_allclose(np.asarray(hit_i.t), np.asarray(hit_r.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(hit_i.tri), np.asarray(hit_r.tri))


def test_pairs_many_blocks_12bit_ids():
    """Block counts past the old 1024 cap (12-bit packed ids): a tiny
    block size forces kp > 1024 on a small mesh; results must stay
    brute-equal."""
    mesh = _mesh(4)  # 5120 tris
    cm = build_cluster_mesh(mesh, block=4)  # ~1280+ blocks
    assert cm.n_blocks > 1024
    o, d = _rays(1024, seed=21)
    config = RenderConfig(cluster=True, cluster_pairs=True,
                          cluster_tile=256, pair_slots=3)
    hit_p = jax.jit(lambda o, d: intersect_mesh_pairs(o, d, cm, config))(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect_mesh_brute(
            o, d, jax.tree.map(jnp.asarray, mesh), use_bbox=False)
    )(o, d)
    t_p, t_b = np.asarray(hit_p.t), np.asarray(hit_b.t)
    miss_p, miss_b = t_p >= 1e30, t_b >= 1e30
    assert (miss_p == miss_b).all()
    np.testing.assert_allclose(t_p[~miss_p], t_b[~miss_b],
                               rtol=2e-4, atol=2e-4)


def test_pairs_default_slots_odd_lane_count():
    """The DEFAULT config (pair_slots=3) through the narrowing
    while_loop with n an odd multiple of 256: m1 must be aligned so
    m1 * F divides pair_tile (a 64-aligned m1 crashed at trace time),
    and n > 2 * m1 exercises the loop's second iteration."""
    mesh = _mesh(3)
    cm = build_cluster_mesh(mesh, block=64)
    n = 768  # odd multiple of 256 -> npad = 768, npad // 2 = 384
    o, d = _rays(n, seed=7)
    config = RenderConfig(cluster=True, cluster_pairs=True,
                          cluster_tile=256)
    assert config.pair_slots == 3  # the default this test guards
    hit_p = jax.jit(
        lambda o, d: intersect_mesh_pairs(o, d, cm, config)
    )(o, d)
    hit_b = jax.jit(
        lambda o, d: intersect_mesh_brute(
            o, d, jax.tree.map(jnp.asarray, mesh), use_bbox=False)
    )(o, d)
    t_p, t_b = np.asarray(hit_p.t), np.asarray(hit_b.t)
    miss_p, miss_b = t_p >= 1e30, t_b >= 1e30
    assert (miss_p == miss_b).all()
    np.testing.assert_allclose(t_p[~miss_p], t_b[~miss_b],
                               rtol=2e-4, atol=2e-4)


def test_pairs_t_init_and_active_masking():
    mesh = _mesh(2)
    cm = build_cluster_mesh(mesh, block=64)
    o, d = _rays(512, seed=5)
    config = RenderConfig(cluster=True, cluster_pairs=True,
                          cluster_tile=256, pair_slots=4)
    t_init = jnp.full((512,), 1e-3, jnp.float32)
    bounded = intersect_mesh_pairs(o, d, cm, config, t_init=t_init)
    assert (np.asarray(bounded.t) >= 1e30).all()
    act = jnp.zeros((512,), bool)
    dead = intersect_mesh_pairs(o, d, cm, config, active=act)
    assert (np.asarray(dead.t) >= 1e30).all()


def test_pairs_render_matches_kd():
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
    img_p = np.asarray(render(
        scene,
        RenderConfig(trace_depth=4, cluster=True, cluster_pairs=True,
                     cluster_tile=256, pair_slots=4),
        spp=spp, seed=0,
    ))
    diff = np.abs(img_kd - img_p)
    assert diff.mean() < 0.01, f"pairs vs kd mean diff {diff.mean()}"

"""Known-answer intersection tests (reference: src/intersections.h)."""

import jax.numpy as jnp
import numpy as np

from kdtreepathtraceroptimization_tpu.ops import intersect as isect, vecmath as vm
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG


def _nrm(hit):
    return np.asarray(vm.v3_to_rows(hit.normal))


def _rays(data):
    o = jnp.asarray([d[0] for d in data], jnp.float32)
    d_ = jnp.asarray([d[1] for d in data], jnp.float32)
    d_ = d_ / jnp.linalg.norm(d_, axis=1, keepdims=True)
    return o, d_


def test_cornell_walls(cornell_scene):
    # camera eye (0,5,10.5); known wall geometry
    cases = [
        # (origin, target, expected material)
        ([0, 5, 10.5], [0, 5, -5], 1),  # back wall
        ([0, 5, 10.5], [-5, 5, 0], 2),  # red left wall
        ([0, 5, 10.5], [5, 5, 0], 3),  # green right wall
        ([0, 5, 10.5], [0, 0, 0], 1),  # floor
        ([0, 5, 10.5], [0, 10, 0], 0),  # ceiling light
    ]
    o = jnp.asarray([c[0] for c in cases], jnp.float32)
    tgt = jnp.asarray([c[1] for c in cases], jnp.float32)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    hit = isect.intersect_geoms(o, d, cornell_scene.geoms)
    np.testing.assert_array_equal(np.asarray(hit.material_id), [c[2] for c in cases])
    # distances are world-space euclidean
    expect_t = np.linalg.norm(np.asarray(tgt) - np.asarray(o), axis=1)
    # hits land on the wall surface (within the wall half-thickness + eps)
    assert np.all(np.abs(np.asarray(hit.t) - expect_t) < 0.35)


def test_miss_is_big(cornell_scene):
    o = jnp.asarray([[0.0, 5.0, 10.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])  # away from the box
    hit = isect.intersect_geoms(o, d, cornell_scene.geoms)
    assert float(hit.t[0]) >= BIG
    assert int(hit.material_id[0]) == -1


def test_box_normal_faces_ray(cornell_scene):
    o = jnp.asarray([[0.0, 5.0, 10.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = isect.intersect_geoms(o, d, cornell_scene.geoms)
    # back wall normal should point +z (toward the camera)
    np.testing.assert_allclose(_nrm(hit)[0], [0, 0, 1], atol=1e-4)


def test_sphere_hit_and_inside():
    import numpy as np
    from kdtreepathtraceroptimization_tpu.scene.structs import GeomSoA, GEOM_SPHERE

    # unit-diameter sphere scaled x4 at origin -> radius 2
    t = np.diag([4.0, 4.0, 4.0, 1.0]).astype(np.float32)[None]
    inv = np.linalg.inv(t[0])[None].astype(np.float32)
    geoms = GeomSoA(
        type=np.array([GEOM_SPHERE], np.int32),
        material_id=np.array([7], np.int32),
        transform=t,
        inverse_transform=inv,
        inv_transpose=np.transpose(inv, (0, 2, 1)).copy(),
    )
    o = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = isect.intersect_geoms(o, d, geoms)
    np.testing.assert_allclose(float(hit.t[0]), 8.0, rtol=1e-5)
    np.testing.assert_allclose(_nrm(hit)[0], [0, 0, 1], atol=1e-5)
    assert bool(hit.outside[0])
    # from inside: hits the far shell at distance 2, normal flipped toward origin
    np.testing.assert_allclose(float(hit.t[1]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(_nrm(hit)[1], [0, 0, 1], atol=1e-5)
    assert not bool(hit.outside[1])


def test_moller_trumbore_known_answer():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.2, 0.2, 1.0], [0.2, 0.2, 1.0], [2.0, 2.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    t, u, v = isect.moller_trumbore(o, d, v0, v1, v2)
    # front hit (winding makes the tri face +z with CCW (v0,v1,v2)?
    # e1 x e2 = +z; dir -z has det = dot(e1, cross(dir, e2)) > 0)
    assert abs(float(t[0, 0]) - 1.0) < 1e-6
    assert abs(float(u[0, 0]) - 0.2) < 1e-6 and abs(float(v[0, 0]) - 0.2) < 1e-6
    # ray pointing away: back-face culled -> miss
    assert float(t[1, 0]) >= BIG
    # outside barycentric range -> miss
    assert float(t[2, 0]) >= BIG


def test_aabb_slab():
    o = jnp.asarray([[0.0, 0.0, 5.0], [2.0, 2.0, 5.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    bb_min = jnp.asarray([-1.0, -1.0, -1.0])
    bb_max = jnp.asarray([1.0, 1.0, 1.0])
    hit, dist = isect.intersect_aabb(o, d, bb_min, bb_max)
    assert bool(hit[0]) and abs(float(dist[0]) - 4.0) < 1e-6
    assert not bool(hit[1])
    assert bool(hit[2])  # origin inside the box counts as hit

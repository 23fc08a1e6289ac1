"""Where do the ~11 ms of post-gather tri_hit_to_hit math go?
Hypothesis: XLA fuses the strided rowst[:, j] reads into every V3
consumer (cross/normalize chains), re-reading the [N,19] gather buffer
with strided access many times. Test optimization_barrier placements on
a local copy of the function, plus the miss->iota index fix.
"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kdtreepathtraceroptimization_tpu.ops import mesh as mesh_ops
from kdtreepathtraceroptimization_tpu.ops.mesh import BIG, TriHit, Hit, _refine_tri_hit_verts_v
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm

N = 640_000
T = 100_000
STEPS = 20


def tri_hit_to_hit_x(origin, direction, tri_hit, mesh, barrier_rows=False,
                     barrier_cols=False, miss_iota=False):
    n = origin.x.shape[0]
    is_hit = tri_hit.tri >= 0
    if miss_iota:
        iota = jax.lax.iota(jnp.int32, n) % jnp.int32(T)
        tri = jnp.where(is_hit, tri_hit.tri, iota)
    else:
        tri = jnp.maximum(tri_hit.tri, 0)

    packed = jnp.concatenate(
        [jnp.asarray(mesh.v0), jnp.asarray(mesh.v1), jnp.asarray(mesh.v2),
         jnp.asarray(mesh.n0), jnp.asarray(mesh.n1), jnp.asarray(mesh.n2),
         jnp.asarray(mesh.material_id).astype(jnp.float32)[:, None]],
        axis=1)
    rowst = packed[jax.lax.stop_gradient(tri)]
    if barrier_rows:
        rowst = jax.lax.optimization_barrier(rowst)

    cols = [rowst[:, j] for j in range(19)]
    if barrier_cols:
        cols = list(jax.lax.optimization_barrier(tuple(cols)))

    def col3(j):
        return vm.V3(cols[j], cols[j + 1], cols[j + 2])

    v0, v1, v2 = col3(0), col3(3), col3(6)
    n0, n1, n2 = col3(9), col3(12), col3(15)
    mat_id = cols[18].astype(jnp.int32)

    t, u, v = _refine_tri_hit_verts_v(origin, direction, v0, v1, v2)
    t = jnp.where(is_hit, t, BIG)
    w = 1.0 - u - v
    normal = vm.normalizev(n0 * w + n1 * u + n2 * v)
    point = origin + direction * t + normal * 1e-4
    zero = jnp.zeros_like(t)
    zv = vm.V3(zero, zero, zero)
    return Hit(t=t, point=vm.wherev(is_hit, point, zv),
               normal=vm.wherev(is_hit, normal, zv),
               material_id=jnp.where(is_hit, mat_id, -1),
               outside=jnp.ones((n,), jnp.bool_))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def main():
    rng = np.random.default_rng(0)

    class M:
        pass

    m = M()
    for f_ in ("v0", "v1", "v2"):
        setattr(m, f_, jnp.asarray(rng.random((T, 3), np.float32) * 10))
    for f_ in ("n0", "n1", "n2"):
        v = rng.random((T, 3), np.float32) - 0.5
        setattr(m, f_, jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True)))
    m.material_id = jnp.asarray(rng.integers(0, 8, size=(T,)).astype(np.int32))

    o = vm.V3(*(jnp.asarray(rng.random((N,), np.float32)) for _ in range(3)))
    d = vm.V3(*(jnp.asarray(rng.random((N,), np.float32) + 0.1) for _ in range(3)))
    tl = jnp.asarray(rng.random((N,), np.float32) * 5)
    tri_r = rng.integers(0, T, size=(N,)).astype(np.int32)
    miss = rng.random(N) < 0.65
    tri0 = jnp.asarray(np.where(miss, -1, tri_r).astype(np.int32))

    def mk(br, bc, mi):
        def full(tri):
            def body(i, carry):
                tri, acc = carry
                th = TriHit(t=tl, tri=tri, u=tl, v=tl)
                h = tri_hit_to_hit_x(o, d, th, m, br, bc, mi)
                acc = acc + h.t + h.normal.x + h.point.y
                tri2 = jnp.where(tri < 0, tri, (tri + i) % T)
                return tri2, acc
            return jax.lax.fori_loop(0, STEPS, body,
                                     (tri, jnp.zeros((N,), jnp.float32)))[1]
        return jax.jit(full)

    for name, br, bc, mi in [
        ("current", False, False, False),
        ("bar_rows", True, False, False),
        ("bar_cols", False, True, False),
        ("bar_rows+cols", True, True, False),
        ("bar_both+iota", True, True, True),
    ]:
        print(f"{name:16s} {timed(mk(br, bc, mi), tri0):7.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()

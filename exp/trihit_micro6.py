"""Full tri_hit_to_hit with Pallas-transpose channel extraction.

micro2-5 story: the row gather is ~8 ms (floor), but turning the
[N,19] gather result into 19 usable [N] channel arrays costs ~7 ms via
XLA strided reads (cross-lane relayout fused into every consumer),
while a Pallas tile transpose [N,19] -> [19,N] measured ~free. Compare
the full Hit expansion: current vs (iota-miss + barrier + pallasT).
Also checks numerical equality of both paths.
"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kdtreepathtraceroptimization_tpu.ops import mesh as mesh_ops
from kdtreepathtraceroptimization_tpu.ops.mesh import BIG, TriHit, Hit, _refine_tri_hit_verts_v
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm

N = 640_000
T = 100_000
STEPS = 20
C = 19


def transpose_pallas(rows, tile=4096):
    n = rows.shape[0]

    def kern(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((C, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C, n), jnp.float32),
    )(rows)


def tri_hit_to_hit_fast(origin, direction, tri_hit, mesh):
    n = origin.x.shape[0]
    is_hit = tri_hit.tri >= 0
    nt = jnp.asarray(mesh.v0).shape[0]
    iota = jax.lax.iota(jnp.int32, n) % jnp.int32(nt)
    tri = jnp.where(is_hit, jax.lax.stop_gradient(tri_hit.tri), iota)

    packed = jnp.concatenate(
        [jnp.asarray(mesh.v0), jnp.asarray(mesh.v1), jnp.asarray(mesh.v2),
         jnp.asarray(mesh.n0), jnp.asarray(mesh.n1), jnp.asarray(mesh.n2),
         jnp.asarray(mesh.material_id).astype(jnp.float32)[:, None]],
        axis=1)
    rowst = packed[tri]
    rowst = jax.lax.optimization_barrier(rowst)
    colst = transpose_pallas(rowst)

    def col3(j):
        return vm.V3(colst[j], colst[j + 1], colst[j + 2])

    v0, v1, v2 = col3(0), col3(3), col3(6)
    n0, n1, n2 = col3(9), col3(12), col3(15)
    mat_id = colst[18].astype(jnp.int32)

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


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    best = float("inf")
    for _ in range(reps):
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

    # correctness first
    th = TriHit(t=tl, tri=tri0, u=tl, v=tl)
    h_ref = jax.jit(lambda: mesh_ops.tri_hit_to_hit(o, d, th, m))()
    h_new = jax.jit(lambda: tri_hit_to_hit_fast(o, d, th, m))()
    for f_ in ("t", "material_id"):
        a, b = np.asarray(getattr(h_ref, f_)), np.asarray(getattr(h_new, f_))
        ok = np.allclose(a, b, rtol=1e-6, atol=1e-6, equal_nan=True)
        print(f"match {f_}: {ok}  maxdiff={np.max(np.abs(a.astype(np.float64)-b.astype(np.float64)))}")
    for f_ in ("point", "normal"):
        a = np.stack([np.asarray(getattr(getattr(h_ref, f_), c)) for c in "xyz"])
        b = np.stack([np.asarray(getattr(getattr(h_new, f_), c)) for c in "xyz"])
        ok = np.allclose(a, b, rtol=1e-5, atol=1e-6, equal_nan=True)
        print(f"match {f_}: {ok}  maxdiff={np.max(np.abs(a-b))}")

    def mk(fn):
        def full(tri):
            def body(i, carry):
                tri, acc = carry
                th = TriHit(t=tl, tri=tri, u=tl, v=tl)
                h = fn(o, d, th, m)
                acc = acc + h.t + h.normal.x + h.point.y
                tri2 = jnp.where(tri < 0, tri, (tri + i) % T)
                return tri2, acc
            return jax.lax.fori_loop(0, STEPS, body,
                                     (tri, jnp.zeros((N,), jnp.float32)))[1]
        return jax.jit(full)

    for name, fn in [("current", mesh_ops.tri_hit_to_hit),
                     ("pallasT+iota", tri_hit_to_hit_fast),
                     ("current(2)", mesh_ops.tri_hit_to_hit),
                     ("pallasT+iota(2)", tri_hit_to_hit_fast)]:
        print(f"{name:16s} {timed(mk(fn), tri0):7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

"""Bisect the ~7 ms post-extraction math in tri_hit_to_hit.
All variants: miss->iota gather + barrier'd column extraction, then an
increasing slice of the real math. ~110 elementwise [640k] ops should
cost <1 ms on paper; find the part that doesn't.
"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kdtreepathtraceroptimization_tpu.ops.mesh import BIG, _refine_tri_hit_verts_v
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm

N = 640_000
T = 100_000
STEPS = 20


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
    packed = jnp.asarray(rng.random((T, 19), np.float32))
    o = vm.V3(*(jnp.asarray(rng.random((N,), np.float32)) for _ in range(3)))
    d = vm.V3(*(jnp.asarray(rng.random((N,), np.float32) + 0.1) for _ in range(3)))
    tri_r = rng.integers(0, T, size=(N,)).astype(np.int32)
    miss = rng.random(N) < 0.65
    tri0 = jnp.asarray(np.where(miss, -1, tri_r).astype(np.int32))
    iota = jnp.arange(N, dtype=jnp.int32) % T

    def extract(tri):
        is_hit = tri >= 0
        idx = jnp.where(is_hit, tri, iota)
        rowst = packed[idx]
        rowst = jax.lax.optimization_barrier(rowst)
        cols = list(jax.lax.optimization_barrier(
            tuple(rowst[:, j] for j in range(19))))
        return is_hit, cols

    def col3(cols, j):
        return vm.V3(cols[j], cols[j + 1], cols[j + 2])

    def mk(level):
        def full(tri):
            def body(i, carry):
                tri, acc = carry
                is_hit, cols = extract(tri)
                if level == 0:
                    s = cols[0]
                    for j in range(1, 19):
                        s = s + cols[j] * float(j + 1)
                    acc = acc + s
                else:
                    v0, v1, v2 = col3(cols, 0), col3(cols, 3), col3(cols, 6)
                    n0, n1, n2 = col3(cols, 9), col3(cols, 12), col3(cols, 15)
                    t, u, v = _refine_tri_hit_verts_v(o, d, v0, v1, v2)
                    if level == 1:
                        acc = acc + t + u + v + n0.x + n1.y + n2.z + cols[18]
                    else:
                        t = jnp.where(is_hit, t, BIG)
                        w = 1.0 - u - v
                        normal = vm.normalizev(n0 * w + n1 * u + n2 * v)
                        if level == 2:
                            acc = acc + t + normal.x + normal.y + cols[18]
                        else:
                            point = o + d * t + normal * 1e-4
                            zero = jnp.zeros_like(t)
                            zv = vm.V3(zero, zero, zero)
                            pw = vm.wherev(is_hit, point, zv)
                            nw = vm.wherev(is_hit, normal, zv)
                            mat = jnp.where(is_hit, cols[18].astype(jnp.int32), -1)
                            acc = (acc + t + pw.y + nw.x
                                   + mat.astype(jnp.float32))
                tri2 = jnp.where(tri < 0, tri, (tri + i) % T)
                return tri2, acc
            return jax.lax.fori_loop(0, STEPS, body,
                                     (tri, jnp.zeros((N,), jnp.float32)))[1]
        return jax.jit(full)

    for name, lv in [("0_extract_only", 0), ("1_+refine", 1),
                     ("2_+normalize", 2), ("3_+point_where", 3)]:
        print(f"{name:16s} {timed(mk(lv), tri0):7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

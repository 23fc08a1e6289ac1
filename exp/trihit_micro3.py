"""Isolate why full tri_hit_to_hit costs 19 ms when gather+extract+use
measures 9.4: suspect the miss-lane index pattern (tri<0 clamped to row
0 -> ~65% of lanes gather the SAME row; perm_micro2 measured mixed
repeated/random gathers at 13.2 ms vs 9.6 all-random), plus the V3
cross/normalize math.

Variants at N=640k, T=100k, 65% miss lanes:
  a. all-random indices                (baseline)
  b. misses -> row 0                   (current behavior)
  c. misses -> iota % T                (spread misses)
  d. b + full tri_hit math             (current function cost)
  e. c + full tri_hit math             (proposed)
"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kdtreepathtraceroptimization_tpu.ops import mesh as mesh_ops
from kdtreepathtraceroptimization_tpu.ops import vecmath as vm

N = 640_000
T = 100_000
STEPS = 20
MISS_FRAC = 0.65


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
    tri_r = rng.integers(0, T, size=(N,)).astype(np.int32)
    miss = rng.random(N) < MISS_FRAC
    tri_m = np.where(miss, -1, tri_r).astype(np.int32)
    tri0 = jnp.asarray(tri_m)
    iota = jnp.arange(N, dtype=jnp.int32) % T

    def gather_sum(idx):
        rows = packed[idx]
        acc = rows[:, 0]
        for j in range(1, 19):
            acc = acc + rows[:, j] * float(j + 1)
        return acc

    @jax.jit
    def v_a(tri):
        def body(i, carry):
            tri, acc = carry
            idx = jnp.where(tri < 0, jnp.abs(tri * 7919) % T, tri)
            acc = acc + gather_sum(idx)
            return (tri + i) % T - (tri % 3 == 0), acc  # keep some misses
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    @jax.jit
    def v_b(tri):
        def body(i, carry):
            tri, acc = carry
            idx = jnp.maximum(tri, 0)
            acc = acc + gather_sum(idx)
            tri2 = jnp.where(tri < 0, tri, (tri + i) % T)
            return tri2, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    @jax.jit
    def v_c(tri):
        def body(i, carry):
            tri, acc = carry
            idx = jnp.where(tri < 0, iota, tri)
            acc = acc + gather_sum(idx)
            tri2 = jnp.where(tri < 0, tri, (tri + i) % T)
            return tri2, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

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

    def full(tri):
        def body(i, carry):
            tri, acc = carry
            th = mesh_ops.TriHit(t=tl, tri=tri, u=tl, v=tl)
            h = mesh_ops.tri_hit_to_hit(o, d, th, m)
            acc = acc + h.t + h.normal.x
            tri2 = jnp.where(tri < 0, tri, (tri + i) % T)
            return tri2, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    v_d = jax.jit(full)

    for name, f in [("a_all_random", v_a), ("b_miss_row0", v_b),
                    ("c_miss_iota", v_c), ("d_full_current", v_d)]:
        print(f"{name:16s} {timed(f, tri0):7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

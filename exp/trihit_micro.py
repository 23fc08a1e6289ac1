"""Micro-probe: tri_hit_to_hit channel-extraction strategies on TPU.

PERF.md r5 finding 4 decomposes tri_hit_to_hit (~18 ms/bounce at 640k
rays, dragon table) into the [T,19]-row gather (~9.6 ms, latency-bound,
width-free) + 19 strided `rowst[:, j]` channel extractions + the
channel-split refine/normal math. This probe isolates the extraction
strategy:

  A. current: 19x `rowst[:, j]` strided slices from the [N, 19] gather
  B. one XLA transpose [N,19]->[19,N], then free contiguous row slices
  C. gather through a [19, T] table column-wise (take axis=1)

then times the FULL tri_hit_to_hit against a transpose-based rewrite.

Run: python exp/trihit_micro.py            (on the tunneled TPU)
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


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1]), out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3  # ms per step


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((T, 19), np.float32))
    tri0 = jnp.asarray(rng.integers(0, T, size=(N,)).astype(np.int32))

    @jax.jit
    def strat_a(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            s = rows[:, 0]
            for j in range(1, 19):
                s = s + rows[:, j]
            acc = acc + s
            tri = (tri + i) % T
            return tri, acc
        _, acc = jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))
        return acc

    @jax.jit
    def strat_b(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            cols = rows.T  # [19, N]
            s = cols[0]
            for j in range(1, 19):
                s = s + cols[j]
            acc = acc + s
            tri = (tri + i) % T
            return tri, acc
        _, acc = jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))
        return acc

    packed_t = packed.T  # [19, T]

    @jax.jit
    def strat_c(tri):
        def body(i, carry):
            tri, acc = carry
            cols = jnp.take(packed_t, tri, axis=1)  # [19, N]
            s = cols[0]
            for j in range(1, 19):
                s = s + cols[j]
            acc = acc + s
            tri = (tri + i) % T
            return tri, acc
        _, acc = jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))
        return acc

    @jax.jit
    def gather_only(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            acc = acc + rows[:, 0]
            tri = (tri + i) % T
            return tri, acc
        _, acc = jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))
        return acc

    for name, f in [("gather_only", gather_only), ("A_strided", strat_a),
                    ("B_transpose", strat_b), ("C_take_axis1", strat_c)]:
        print(f"{name:14s} {timed(f, tri0):7.2f} ms/step", flush=True)

    # --- full tri_hit_to_hit: current vs transpose rewrite -------------
    class FakeMesh:
        pass

    m = FakeMesh()
    for f_ in ("v0", "v1", "v2"):
        setattr(m, f_, jnp.asarray(rng.random((T, 3), np.float32) * 10))
    for f_ in ("n0", "n1", "n2"):
        v = rng.random((T, 3), np.float32) - 0.5
        setattr(m, f_, jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True)))
    m.material_id = jnp.asarray(rng.integers(0, 8, size=(T,)).astype(np.int32))

    o = vm.V3(*(jnp.asarray(rng.random((N,), np.float32)) for _ in range(3)))
    d = vm.V3(*(jnp.asarray(rng.random((N,), np.float32) + 0.1) for _ in range(3)))
    t_loop = jnp.asarray(rng.random((N,), np.float32) * 5)

    @jax.jit
    def full_current(tri):
        def body(i, carry):
            tri, acc = carry
            th = mesh_ops.TriHit(t=t_loop, tri=tri, u=t_loop, v=t_loop)
            h = mesh_ops.tri_hit_to_hit(o, d, th, m)
            acc = acc + h.t + h.normal.x
            tri = ((tri + i) % T) - (i % 2)  # keep some misses (-1)
            return tri, acc
        _, acc = jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))
        return acc

    print(f"{'full_current':14s} {timed(full_current, tri0):7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

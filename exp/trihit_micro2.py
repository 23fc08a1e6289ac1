"""Follow-up: can the [N,19] -> 19x[N] relayout after the row gather be
driven to bandwidth with a Pallas transpose kernel, or is XLA's fusion
of the gather+extraction the problem (test with optimization_barrier)?

trihit_micro.py measured: gather_only 8.0 ms, full tri_hit_to_hit
19.0 ms at N=640k, T=100k on v5e. The 11 ms delta is relayout + math;
48 MB in+out should be ~0.15 ms at bandwidth.
"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 640_000
T = 100_000
STEPS = 20
C = 19


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


def transpose_pallas(rows):
    """[N, C] -> [C, N] tilewise."""
    tile = 2048

    def kern(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    return pl.pallas_call(
        kern,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((tile, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((C, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((C, N), jnp.float32),
    )(rows)


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.random((T, C), np.float32))
    tri0 = jnp.asarray(rng.integers(0, T, size=(N,)).astype(np.int32))

    def use_cols(cols):
        # 19 distinct per-channel uses so XLA can't collapse to one
        # lane reduction (the real tri_hit math uses each separately).
        acc = cols[0] * 1.0
        for j in range(1, C):
            acc = acc + cols[j] * float(j + 1)
        return acc

    @jax.jit
    def v_strided(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            acc = acc + use_cols([rows[:, j] for j in range(C)])
            tri = (tri + i) % T
            return tri, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    @jax.jit
    def v_barrier(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            rows = jax.lax.optimization_barrier(rows)
            acc = acc + use_cols([rows[:, j] for j in range(C)])
            tri = (tri + i) % T
            return tri, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    @jax.jit
    def v_pallas_t(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            rows = jax.lax.optimization_barrier(rows)
            cols = transpose_pallas(rows)
            acc = acc + use_cols([cols[j] for j in range(C)])
            tri = (tri + i) % T
            return tri, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    @jax.jit
    def v_xla_t_barrier(tri):
        def body(i, carry):
            tri, acc = carry
            rows = packed[tri]
            rows = jax.lax.optimization_barrier(rows)
            cols = rows.T
            cols = jax.lax.optimization_barrier(cols)
            acc = acc + use_cols([cols[j] for j in range(C)])
            tri = (tri + i) % T
            return tri, acc
        return jax.lax.fori_loop(0, STEPS, body, (tri, jnp.zeros((N,), jnp.float32)))[1]

    for name, f in [("strided", v_strided), ("barrier+strided", v_barrier),
                    ("barrier+pallasT", v_pallas_t),
                    ("barrier+xlaT+bar", v_xla_t_barrier)]:
        try:
            print(f"{name:18s} {timed(f, tri0):7.2f} ms/step", flush=True)
        except Exception as e:  # noqa
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Can Pallas do per-lane dynamic gathers from a VMEM-resident table, and
how fast? Compare against XLA loop gather at various row widths."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def xla_loop(rows, idx0, steps):
    m = rows.shape[0]

    @jax.jit
    def run(rows, idx0):
        def body(i, state):
            idx, acc = state
            row = rows[idx]
            acc = acc + row[:, 1]
            nxt = (idx * 1103515245 + 12345 + row[:, 0].astype(jnp.int32)) % m
            return (nxt, acc)
        _, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros(idx0.shape, jnp.float32)))
        return acc
    return run


def pallas_loop(rows, idx0, steps, tile=2048):
    m, W = rows.shape
    n = idx0.shape[0]

    def kernel(rows_ref, idx_ref, out_ref):
        def body(i, state):
            idx, acc = state
            row = rows_ref[idx]  # per-lane gather from VMEM
            acc = acc + row[:, 1]
            nxt = (idx * 1103515245 + 12345 + row[:, 0].astype(jnp.int32)) % m
            return (nxt, acc)
        _, acc = jax.lax.fori_loop(
            0, steps, body,
            (idx_ref[:], jnp.zeros(idx_ref.shape, jnp.float32)),
        )
        out_ref[:] = acc

    @jax.jit
    def run(rows, idx0):
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[
                pl.BlockSpec((m, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        )(rows, idx0)
    return run


def main():
    key = jax.random.PRNGKey(0)
    n = 128 * 1024
    steps = 64
    for W in [8, 16, 84, 128]:
        for m in [8 * 1024, 32 * 1024]:
            rows = jax.random.normal(key, (m, W), jnp.float32)
            idx0 = jax.random.randint(key, (n,), 0, m, dtype=jnp.int32)
            run = xla_loop(rows, idx0, steps)
            dt, _ = timeit(run, rows, idx0)
            print(f"XLA    W={W:4d} m={m:6d}  {dt*1e3:8.2f} ms  {dt/(n*steps)*1e9:6.2f} ns/lane/step")
            try:
                runp = pallas_loop(rows, idx0, steps)
                dt, _ = timeit(runp, rows, idx0)
                print(f"PALLAS W={W:4d} m={m:6d}  {dt*1e3:8.2f} ms  {dt/(n*steps)*1e9:6.2f} ns/lane/step")
            except Exception as e:
                print(f"PALLAS W={W:4d} m={m:6d}  FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

"""Microbench: row-gather cost inside a loop, XLA vs Pallas, vs table size.

Run on the real TPU chip to ground the Pallas traversal kernel design.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])  # host read forces execution (axon tunnel)
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def xla_gather_loop(rows, n_lanes, steps, key):
    """Mimic the fat-row traversal: per-lane row gather + a bit of math +
    data-dependent next index."""
    m = rows.shape[0]

    @jax.jit
    def run(rows, idx0):
        def body(i, state):
            idx, acc = state
            row = rows[idx]  # [n, W] gather
            acc = acc + row[:, 1]
            # pseudo-random, data-dependent walk
            nxt = (idx * 1103515245 + 12345 + row[:, 0].astype(jnp.int32)) % m
            return (nxt, acc)
        idx, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros((n_lanes,), jnp.float32)))
        return acc
    idx0 = jax.random.randint(key, (n_lanes,), 0, m, dtype=jnp.int32)
    return run, (rows, idx0)


def main():
    key = jax.random.PRNGKey(0)
    n_lanes = 128 * 1024
    steps = 64
    W = 84
    print(f"lanes={n_lanes} steps={steps} width={W}")
    for m in [4 * 1024, 16 * 1024, 24 * 1024, 32 * 1024, 64 * 1024, 128 * 1024, 256 * 1024]:
        rows = jax.random.normal(key, (m, W), jnp.float32)
        run, args = xla_gather_loop(rows, n_lanes, steps, key)
        dt, _ = timeit(run, *args)
        ns_per = dt / (n_lanes * steps) * 1e9
        print(f"XLA  m={m:7d}  {dt*1e3:8.2f} ms  {ns_per:6.2f} ns/lane/step")


if __name__ == "__main__":
    main()

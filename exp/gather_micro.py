"""On-chip microbenchmarks for traversal-kernel design.

Answers, on the real v5e:
 1. XLA in-loop row-gather cost vs table rows R and row width W
    (validates/updates the r1 'cliff at 24k rows, flat in width' model).
 2. Whether Pallas/Mosaic supports a per-lane gather (jnp.take) from a
    VMEM-resident table inside a kernel, and its cost.
 3. VMEM capacity sanity (how big a table fits).
"""
import sys, time, json
import numpy as np
import jax, jax.numpy as jnp
import functools

STEPS = 64
N = 10240  # lanes


def bench_xla_gather(R, W):
    table = jnp.asarray(np.random.rand(R, W).astype(np.float32))
    idx0 = jnp.asarray(np.random.randint(0, R, size=(N,)).astype(np.int32))

    @jax.jit
    def run(idx):
        def body(i, carry):
            idx, acc = carry
            row = table[idx]  # [N, W]
            acc = acc + row[:, 0]
            # next index depends on the row -> serializes like traversal
            idx = (idx + row[:, 1].astype(jnp.int32) + i) % R
            return (idx, acc)
        idx, acc = jax.lax.fori_loop(0, STEPS, body, (idx, jnp.zeros((N,), jnp.float32)))
        return acc

    acc = run(idx0)
    float(acc[0])
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(idx0)
        float(acc[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS / N * 1e9  # ns per lane per step


def bench_pallas_gather(R, W):
    """Same loop inside one Pallas kernel, table in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    table = jnp.asarray(np.random.rand(R, W).astype(np.float32))
    idx0 = jnp.asarray(np.random.randint(0, R, size=(N,)).astype(np.int32))

    def kernel(idx_ref, table_ref, out_ref):
        tbl = table_ref[:, :]
        def body(i, carry):
            idx, acc = carry
            row = jnp.take(tbl, idx, axis=0)  # [N, W] per-lane gather
            acc = acc + row[:, 0]
            idx = (idx + row[:, 1].astype(jnp.int32) + i) % R
            return (idx, acc)
        idx, acc = jax.lax.fori_loop(0, STEPS, body,
                                     (idx_ref[:], jnp.zeros((N,), jnp.float32)))
        out_ref[:] = acc

    @jax.jit
    def run(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    acc = run(idx0)
    float(acc[0])
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(idx0)
        float(acc[0])
        best = min(best, time.perf_counter() - t0)
    return best / STEPS / N * 1e9


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'xla'
    if which == 'xla':
        for R in (1536, 3072, 6144, 12288, 24576, 49152, 98304):
            for W in (88, 160, 304, 592):
                ns = bench_xla_gather(R, W)
                print(json.dumps({'kind': 'xla', 'R': R, 'W': W,
                                  'ns_lane_step': round(ns, 2)}), flush=True)
    else:
        for R in (3072, 6144, 12288):
            for W in (8, 88, 304):
                try:
                    ns = bench_pallas_gather(R, W)
                    print(json.dumps({'kind': 'pallas', 'R': R, 'W': W,
                                      'ns_lane_step': round(ns, 2)}), flush=True)
                except Exception as e:
                    print(json.dumps({'kind': 'pallas', 'R': R, 'W': W,
                                      'error': str(e)[:200]}), flush=True)


if __name__ == '__main__':
    main()

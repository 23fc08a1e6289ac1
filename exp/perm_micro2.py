"""Amortized permute/reduce micro-benchmarks on the real TPU.

perm_micro.py's numbers were dispatch-latency bound (~50-100 ms tunnel
round trip per call). Here every measured op is chained REPS times
inside ONE jitted fori_loop with a data dependency between iterations,
so the per-op cost is (total - overhead) / REPS.

Ops (n = 640k default):
  baseline   : the chain harness with a trivial op (measures overhead)
  take_rows  : y = x[idx]            x [n,16] f32, random idx
  take_perm  : same but idx = a bin-coherent permutation (counting-sort
               shape: mostly-ascending runs) - does XLA care?
  sort2      : lax.sort (u32 key, i32 payload)
  cumsum     : jnp.cumsum [n] i32
  seg_min    : jax.ops.segment_min of n values into n//6 segments
               (block-major design's epilogue reduction)
  scat_min   : zeros.at[idx].min(vals) raw scatter-min form
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

n = int(os.environ.get("N", str(640 * 1024)))
REPS = int(os.environ.get("REPS", "16"))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
idx = jnp.asarray(rng.permutation(n).astype(np.int32))
# bin-coherent permutation: 512 bins, stable counting-sort of a random
# bin assignment -> destination order is runs of ascending source ids
bins = rng.integers(0, 512, n)
perm = np.argsort(bins, kind="stable").astype(np.int32)
perm_j = jnp.asarray(perm)
key_u = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
vals = jnp.asarray(rng.normal(size=n).astype(np.float32))
seg = jnp.asarray(np.sort(rng.integers(0, n // 6, n)).astype(np.int32))


def chain(label, op, init, reps=REPS):
    """Run op reps times with a dependency chain inside one jit."""

    def body(i, carry):
        return op(i, carry)

    # Reduce to scalars INSIDE the jit: forcing via host read of a full
    # array would transfer it over the tunnel (41 MB for [n,16]).
    f = jax.jit(lambda c: [a.sum() for a in
                           jax.tree.leaves(jax.lax.fori_loop(0, reps, body, c))])
    out = f(init)
    _ = float(np.asarray(out[0]))  # force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(init)
        _ = float(np.asarray(out[0]))
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"{label:10s} {per*1e3:9.3f} ms/op  ({per/n*1e9:7.2f} ns/row)  "
          f"[total {best*1e3:.1f} ms]", flush=True)


# overhead baseline: add a scalar each iteration
chain("baseline", lambda i, c: c + 1.0, jnp.float32(0.0))

# take_rows: rotate idx by i to defeat CSE; result feeds next via carry
chain("take_rows",
      lambda i, c: c.at[0, 0].add(0.0)[idx],
      x)

chain("take_perm",
      lambda i, c: c.at[0, 0].add(0.0)[perm_j],
      x)

chain("sort2",
      lambda i, c: jax.lax.sort((c[0] ^ i.astype(jnp.uint32), c[1]),
                                num_keys=1),
      (key_u, idx))

chain("cumsum",
      lambda i, c: jnp.cumsum(c) % jnp.int32(1 << 20),
      jnp.ones((n,), jnp.int32))

m = n // 6
chain("seg_min",
      lambda i, c: jax.ops.segment_min(
          jnp.concatenate([c, vals[m:]]), seg, num_segments=m,
          indices_are_sorted=True)[:m],
      vals[:m])

chain("scat_min",
      lambda i, c: jnp.full((n,), 1e9, jnp.float32).at[idx].min(c),
      vals)

"""Micro: bulk permutation primitives on the real TPU at wavefront scale.

What it times (n = 640k unless N env):
  take_rows   : x[idx] for x [n, 8] f32, random idx     (the binning atom)
  take_cols   : 8 separate [n] takes (field-major alternative)
  sort2       : lax.sort (key u32, idx u32)             (argsort)
  sort10      : lax.sort 10-operand (round-2's coherence sort)
  cumsum      : jnp.cumsum over [n] i32
  radix4     : one 4-bit counting-sort pass = 16 masked cumsums + take
  oct_bin     : 3-bit octant binning = rank via cumsum + take + untake
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

n = int(os.environ.get("N", str(640 * 1024)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
idx = jnp.asarray(rng.permutation(n).astype(np.int32))
key = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))
key8 = jnp.asarray(rng.integers(0, 8, n, dtype=np.int32))


def timeit(label, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # force via host read of one element
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    print(f"{label:12s} {best*1e3:9.3f} ms  ({best/n*1e9:7.2f} ns/row)", flush=True)


timeit("take_rows", lambda x, i: x[i], x, idx)
timeit("take_cols", lambda x, i: tuple(x[:, j][i] for j in range(8)), x, idx)
timeit("cumsum", lambda k: jnp.cumsum(k), key8)
timeit("sort2", lambda k, i: jax.lax.sort((k, i), num_keys=1), key, idx)
timeit("sort10",
       lambda k, x, i: jax.lax.sort(
           (k, i) + tuple(x[:, j] for j in range(8)), num_keys=1),
       key, x, idx)


def radix4(x, k):
    ranks = jnp.zeros((n,), jnp.int32)
    base = jnp.int32(0)
    digit = k & 15
    for v in range(16):
        m = (digit == v).astype(jnp.int32)
        ranks = jnp.where(digit == v, base + jnp.cumsum(m) - 1, ranks)
        base = base + jnp.sum(m)
    inv = ranks  # dest position of each row
    xs = jnp.zeros_like(x).at[inv].set(x)
    return xs


timeit("radix4_scat", radix4, x, key)


def oct_bin(x, k8):
    ranks = jnp.zeros((n,), jnp.int32)
    base = jnp.int32(0)
    for v in range(8):
        m = (k8 == v).astype(jnp.int32)
        ranks = jnp.where(k8 == v, base + jnp.cumsum(m) - 1, ranks)
        base = base + jnp.sum(m)
    # forward: sorted[ranks[i]] = x[i]  -> argsort(ranks) gather form:
    perm = jnp.zeros((n,), jnp.int32).at[ranks].set(jnp.arange(n, dtype=jnp.int32))
    xs = x[perm]
    xb = xs[ranks]  # unsort: row i reads back its slot
    return xb


timeit("oct_bin", oct_bin, x, key8)

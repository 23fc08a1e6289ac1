"""Cost of reordering a wavefront: keys-only sort + row-bundle gather
vs the current 8-operand lax.sort."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, reps=5):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best

n = 640_000
key = jax.random.PRNGKey(0)
keys = jax.random.randint(key, (n,), 0, 1 << 24, dtype=jnp.int32)
rows = jax.random.normal(key, (n, 8), jnp.float32)

@jax.jit
def sort_k(keys):
    return jax.lax.sort((keys, jax.lax.iota(jnp.int32, n)), num_keys=1)
print(f"keys+idx sort 640k: {timeit(sort_k, keys)*1e3:.2f} ms", flush=True)

@jax.jit
def rowgather(rows, keys):
    _, idx = jax.lax.sort((keys, jax.lax.iota(jnp.int32, n)), num_keys=1)
    return rows[idx]
print(f"sort + row-gather [640k, 8]: {timeit(rowgather, rows, keys)*1e3:.2f} ms", flush=True)

# 8-bucket counting permute (octant): rank via cumsum over onehot chunks
@jax.jit
def bucket_permute(rows, keys):
    b = keys & 7  # 3-bit bucket
    oh = jax.nn.one_hot(b, 8, dtype=jnp.int32)  # [n, 8]
    csum = jnp.cumsum(oh, axis=0)
    rank = jnp.take_along_axis(csum, b[:, None], axis=1)[:, 0] - 1
    counts = csum[-1]
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    slot = offs[b] + rank
    out = jnp.zeros_like(rows).at[slot].set(rows)
    return out
print(f"8-bucket counting permute [640k, 8]: {timeit(bucket_permute, rows, keys)*1e3:.2f} ms", flush=True)

# 64-bucket variant
@jax.jit
def bucket_permute64(rows, keys):
    b = keys & 63
    oh = jax.nn.one_hot(b, 64, dtype=jnp.int32)
    csum = jnp.cumsum(oh, axis=0)
    rank = jnp.take_along_axis(csum, b[:, None], axis=1)[:, 0] - 1
    counts = csum[-1]
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    slot = offs[b] + rank
    return jnp.zeros_like(rows).at[slot].set(rows)
print(f"64-bucket counting permute: {timeit(bucket_permute64, rows, keys)*1e3:.2f} ms", flush=True)

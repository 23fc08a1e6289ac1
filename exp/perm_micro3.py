"""Movement-primitive shootout for the runs-based pair pass (TPU).

Compares, at P ~ 1M pairs:
  a. 1-op packed-key sort + [P, 8] row gather   (key sort, then fetch od)
  b. 8-op payload sort (key + 7 payload channels) (carry od through sort)
  c. 3-op back-sort (src, t, loc)
  d. 2-op back-sort (src, packed t|loc)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

P = 983040  # 320k rays x F=3
N = 327680
F = 3
KP = 512

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, KP + 1, size=(P,)), jnp.int32)
od8 = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
tvals = jnp.asarray(rng.random((P,)).astype(np.float32))
locs = jnp.asarray(rng.integers(0, 256, size=(P,)), jnp.int32)
P2 = 1 << (P - 1).bit_length()
print(f"P={P} P2={P2}", flush=True)


def timeit(label, fn, init, reps=8):
    f = jax.jit(lambda c: jax.tree.map(
        lambda a: jnp.sum(a.astype(jnp.float32)),
        jax.lax.fori_loop(0, reps, lambda i, c: fn(c), init)))
    v = float(np.asarray(jax.tree.leaves(f(init))[0]))
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        v = float(np.asarray(jax.tree.leaves(f(init))[0]))
        best = min(best, time.perf_counter() - t)
    per = best / reps
    print(f"{label:24s} {per*1e3:8.2f} ms  v={v:.3g}", flush=True)


iota = jnp.arange(P, dtype=jnp.int32)


def key_sort_gather(c):
    keys = c * P2 + iota
    keys_s = jax.lax.sort(keys)
    src = keys_s & (P2 - 1)
    ray = src // F
    od = od8[ray]
    return c + 0 * (keys_s + od[:, 0].astype(jnp.int32))

timeit("a_keysort+gather", key_sort_gather, ids)


def key_sort_only(c):
    keys = c * P2 + iota
    keys_s = jax.lax.sort(keys)
    return c + 0 * keys_s

timeit("a1_keysort_only", key_sort_only, ids)


def gather_only(c):
    ray = jnp.abs(c) % N
    od = od8[ray]
    return c + 0 * od[:, 0].astype(jnp.int32)

timeit("a2_gather_only", gather_only, ids)


def payload_sort(c):
    keys = c * P2 + iota
    ray = iota // F
    ops = (keys,) + tuple(od8[:, j][ray] for j in range(7))
    out = jax.lax.sort(ops, num_keys=1)
    return c + 0 * (out[0] + out[1].astype(jnp.int32))

timeit("b_payload_sort(8op)", payload_sort, ids)


def back3(c):
    _, t_p, loc_p = jax.lax.sort((c, tvals, locs), num_keys=1)
    return c + 0 * (t_p.astype(jnp.int32) + loc_p)

timeit("c_back_sort3", back3, ids)


def back2(c):
    packed = (jax.lax.bitcast_convert_type(tvals, jnp.int32) & ~0xFF) | locs
    _, p = jax.lax.sort((c, packed), num_keys=1)
    return c + 0 * p

timeit("d_back_sort2", back2, ids)


def scatter_min_packed(c):
    packed = (jax.lax.bitcast_convert_type(tvals, jnp.int32) & ~0xFF) | locs
    ray = jnp.abs(c) % N
    out = jnp.full((N,), 0x7F800000, jnp.int32).at[ray].min(packed)
    return c + 0 * out[0]

timeit("e_scatter_min", scatter_min_packed, ids)

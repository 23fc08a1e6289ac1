"""On-chip rates for the cluster-MXU intersector design.

1. mxu_bf brute kernel rate (f32) on ~100k tris: per-pair cost.
2. Same matmul shape in bf16 (selection-precision candidate).
3. Multi-operand lax.sort at wavefront size (per-bounce ray sort).
4. Fused [Tr, K] slab-cull reduction cost (VPU).
5. top_k cost at [G, 512] -> V.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


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


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    N = 131072
    T = 100_000

    # --- 1. existing brute kernel f32
    from kdtreepathtraceroptimization_tpu.ops.mxu_bf import intersect_brute_mxu
    o = jax.random.normal(key, (N, 3), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    v0 = jax.random.normal(jax.random.PRNGKey(2), (T, 3), jnp.float32) * 2
    v1 = v0 + jax.random.normal(jax.random.PRNGKey(3), (T, 3), jnp.float32) * 0.05
    v2 = v0 + jax.random.normal(jax.random.PRNGKey(4), (T, 3), jnp.float32) * 0.05
    f = jax.jit(lambda o, d: intersect_brute_mxu(o, d, v0, v1, v2))
    dt = timeit(f, o, d, reps=3)
    flops = N * 16 * 4 * T * 2
    print(f"1. brute mxu f32: {dt*1e3:.1f} ms  {flops/dt/1e12:.2f} TFLOP/s  "
          f"{dt/N*1e9:.0f} ns/ray @100k tris", flush=True)

    # --- 2. raw matmul rates at kernel shapes
    for dtype, prec in [(jnp.float32, None), (jnp.bfloat16, None)]:
        a = jax.random.normal(key, (2048, 16)).astype(dtype)
        b = jax.random.normal(key, (16, 2048)).astype(dtype)
        steps = 2000

        @jax.jit
        def mm(a, b):
            def body(i, acc):
                return acc + jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) [:, :128].sum(1)
            return jax.lax.fori_loop(0, steps, body, jnp.zeros((2048,), jnp.float32))
        dt = timeit(mm, a, b, reps=3)
        fl = steps * 2048 * 16 * 2048 * 2
        print(f"2. dot [2048,16]@[16,2048] {dtype.__name__}: "
              f"{fl/dt/1e12:.2f} TFLOP/s ({dt/steps*1e6:.1f} us/step)", flush=True)

    # --- 3. multi-operand sort at wavefront size
    nw = 640_000
    keys = jax.random.randint(key, (nw,), 0, 1 << 30, dtype=jnp.int32)
    pay = [jax.random.normal(key, (nw,), jnp.float32) for _ in range(7)]

    @jax.jit
    def srt(keys, *pay):
        return jax.lax.sort((keys,) + pay, num_keys=1)
    dt = timeit(srt, keys, *pay, reps=3)
    print(f"3. lax.sort 640k keys + 7 payloads: {dt*1e3:.2f} ms", flush=True)

    # --- 4. fused slab-cull reduction: [G, Tr, K] -> per-block min entry
    G, Tr, K = 64, 2048, 512
    og = jax.random.normal(key, (G, Tr, 3), jnp.float32)
    dg = jax.random.normal(key, (G, Tr, 3), jnp.float32)
    lo = jax.random.normal(key, (K, 3), jnp.float32)
    hi = lo + 0.5

    @jax.jit
    def cull(og, dg):
        inv = 1.0 / dg  # [G, Tr, 3]
        def per_tile(carry, ods):
            o, dinv = ods
            t0 = (lo[None, :, :] - o[:, None, :]) * dinv[:, None, :]
            t1 = (hi[None, :, :] - o[:, None, :]) * dinv[:, None, :]
            tn = jnp.minimum(t0, t1).max(-1)
            tf = jnp.maximum(t0, t1).min(-1)
            hit = (tf >= jnp.maximum(tn, 0.0))
            entry = jnp.where(hit, tn, jnp.inf)
            return carry, entry.min(0)  # per-block min over rays
        _, prio = jax.lax.scan(per_tile, 0, (og, inv))
        return prio
    dt = timeit(cull, og, dg, reps=3)
    tests = G * Tr * K
    print(f"4. slab cull {G}x{Tr}x{K}: {dt*1e3:.2f} ms "
          f"({dt/tests*1e12:.1f} ps/test, ~{tests*14/dt/1e12:.2f} TFLOP/s)", flush=True)

    # --- 5. top_k on [G, K]
    prio = jax.random.normal(key, (320, 512), jnp.float32)

    @jax.jit
    def topk(p):
        return jax.lax.top_k(-p, 64)
    dt = timeit(topk, prio, reps=3)
    print(f"5. top_k 64 of [320, 512]: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

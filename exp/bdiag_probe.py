"""Isolate bdiag kernel cost components: matmul-16 vs matmul-128,
feat128 build, run walk, DMAs."""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu
from kdtreepathtraceroptimization_tpu.ops import mxu_bf, pairs as pr

block = 256
kreal = 391
kp = 512
PT = int(os.environ.get("PT", "1024"))
P = 960512 // PT * PT
g = P // PT
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(kp, 16, 4 * block)).astype(np.float32))
feat = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
blk = np.sort(rng.integers(0, kreal, P)).astype(np.int32)
blk_s = jnp.asarray(blk)
tfirst = jnp.minimum(blk_s.reshape(g, PT)[:, 0], kreal - 1)


def kernel_k1(tfirst_a, blk3, blkcol, feat_ref, w1_ref, p_ref):
    # single [PT,16]x[16,4B] matmul + epilogue + packed min
    feat_v = feat_ref[:, :]
    t0col = feat_v[:, 10:11]
    cols = jax.lax.broadcasted_iota(jnp.int32, (PT, block), 1)
    prod = jax.lax.dot_general(feat_v, w1_ref[0],
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    t = mxu_bf._epilogue(prod, block, t0col)
    p_ref[:, :] = jnp.min(pr._pack_tl(t, cols), axis=1, keepdims=True)


def kernel_k2(tfirst_a, blk3, blkcol, feat_ref, w1_ref, p_ref, wbuf):
    # feat128 build + [PT,128]x[128,4B] matmul + epilogue + packed min
    feat_v = feat_ref[:, :]
    t0col = feat_v[:, 10:11]
    rows = jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (PT, block), 1)
    cols128 = jax.lax.broadcasted_iota(jnp.int32, (PT, 128), 1)
    lane_slot = cols128 // 16
    wbuf[0:16, :] = w1_ref[0]
    slot = (rows // (PT // 8)).astype(jnp.int32)  # fake slot spread
    feat_tiled = pltpu.repeat(feat_v, 8, axis=1)
    feat128 = jnp.where(lane_slot == slot, feat_tiled, 0.0)
    prod = jax.lax.dot_general(feat128, wbuf[:, :],
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    t = mxu_bf._epilogue(prod, block, t0col)
    p_ref[:, :] = jnp.min(pr._pack_tl(t, cols), axis=1, keepdims=True)


def kernel_k3(tfirst_a, blk3, blkcol, feat_ref, w1_ref, p_ref, wbuf):
    # K2 + the 8-step run walk (runlens + SMEM boundary reads), no DMAs
    feat_v = feat_ref[:, :]
    t0col = feat_v[:, 10:11]
    rows = jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (PT, block), 1)
    cols128 = jax.lax.broadcasted_iota(jnp.int32, (PT, 128), 1)
    lane_slot = cols128 // 16
    blkcol_v = blkcol[:, :]
    wbuf[0:16, :] = w1_ref[0]

    def runlen(r0, b):
        return r0 + jnp.sum(((blkcol_v == b) & (rows >= r0)).astype(jnp.int32))

    r = jnp.int32(0)
    b = blk3[0, 0, 0]
    starts = []
    for j in range(8):
        valid = (r < PT) & (b < kreal)
        starts.append(jnp.where(valid, r, jnp.int32(PT)))
        r_next = jnp.where(valid, runlen(r, b), r)
        b_next = blk3[0, 0, jnp.minimum(r_next, PT - 1)]
        r = r_next
        b = jnp.where(valid, b_next, b)
    slot = jnp.full((PT, 1), -1, jnp.int32)
    for s_j in starts:
        slot = slot + (rows >= s_j).astype(jnp.int32)
    feat_tiled = pltpu.repeat(feat_v, 8, axis=1)
    feat128 = jnp.where(lane_slot == slot, feat_tiled, 0.0)
    prod = jax.lax.dot_general(feat128, wbuf[:, :],
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    t = mxu_bf._epilogue(prod, block, t0col)
    p_ref[:, :] = jnp.min(pr._pack_tl(t, cols), axis=1, keepdims=True)


def call(kern, scratch):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, PT), lambda i, tf: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PT, 1), lambda i, tf: (i, 0)),
            pl.BlockSpec((PT, 16), lambda i, tf: (i, 0)),
            pl.BlockSpec((1, 16, 4 * block), lambda i, tf: (tf[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((PT, 1), lambda i, tf: (i, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((P, 1), jnp.int32),
                          )(tfirst, blk_s.reshape(g, 1, PT),
                            blk_s.reshape(P, 1), feat, w)


def timeit(tag, fn, reps=6):
    f = jax.jit(lambda c: jax.lax.fori_loop(
        0, reps, lambda i, cc: cc + 0 * fn()[:8, 0].astype(jnp.float32),
        c)[:4].sum())
    z = jnp.zeros((8,), jnp.float32)
    float(np.asarray(f(z))); best = 1e9
    for _ in range(3):
        t = time.perf_counter(); float(np.asarray(f(z)))
        best = min(best, (time.perf_counter() - t) / reps)
    print(f"{tag:28s} {best*1e3:8.2f} ms", flush=True)


timeit("K1 matmul16+epi", lambda: call(kernel_k1, []))
timeit("K2 +feat128+matmul128", lambda: call(
    kernel_k2, [pltpu.VMEM((128, 4 * block), jnp.float32)]))
timeit("K3 +runwalk", lambda: call(
    kernel_k3, [pltpu.VMEM((128, 4 * block), jnp.float32)]))
timeit("full bdiag", lambda: pr._pair_bdiag_pallas(
    blk_s, feat, w, block, PT, kreal, False))
timeit("full runs(256)", lambda: pr._pair_runs_pallas(
    blk_s, feat, w, block, 256, kreal, False))

"""Localize the extraction kernel's cost at dragon scale (TPU).

Variants:
  full      current kernel (VPU slab + packed-key top-F selection)
  slab_only VPU slab entry math only (selection stubbed to a min)
  sel_only  selection only (entry = cheap fake from x)
  sub4/sub2 fewer, larger subtile rows
  mmbf16    slab products via bf16 matmul (quantized table), f32 accum
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp
import jax.experimental.pallas as pl

from kdtreepathtraceroptimization_tpu.ops import pairs as pr
from kdtreepathtraceroptimization_tpu.ops import walk as wk
from kdtreepathtraceroptimization_tpu.ops.intersect import BIG
from bench import _mesh_scene

REPS = int(os.environ.get("REPS", "8"))
scene, n_tris, label = _mesh_scene(800, None)
cm = scene.cmesh
tile, F = 1024, 3
kp = cm.n_blocks
print(f"{label} kp={kp}", flush=True)

w = np.load("/tmp/wave.npz")
o = jnp.asarray(w["o"]) - cm.center_shift
d = jnp.asarray(w["d"])
t0 = jnp.asarray(np.minimum(w["t0"], 1e4))
n = o.shape[0]
act = jnp.ones((n,), jnp.float32)
x = wk._ray16(o, d, t0, act)

# bf16 slab matmul table: [16, 6K], rows 8+a = lo_a (span a) / hi_a
# (span 3+a), quantized
slab_np = np.asarray(cm.slab)
sw = np.zeros((16, 6 * kp), np.float32)
for a in range(3):
    sw[8 + a, a * kp:(a + 1) * kp] = slab_np[a]
    sw[8 + a, (3 + a) * kp:(4 + a) * kp] = slab_np[3 + a]
swb = jnp.asarray(sw, jnp.bfloat16)


def timeit(label, fn, init, reps=REPS):
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
    print(f"{label:12s} {per*1e3:9.2f} ms  v={v:.3g}", flush=True)


def run_variant(kern, extra_specs=(), extra_args=(), nsub=8):
    kernel = functools.partial(kern, kp=kp, tile=tile, F=F, nsub=nsub)
    gg = n // tile

    @jax.jit
    def go(x, *extra):
        ids, lbov, cnt = pl.pallas_call(
            kernel,
            grid=(gg,),
            in_specs=[
                pl.BlockSpec((tile, 16), lambda i: (i, 0)),
                pl.BlockSpec((8, kp), lambda i: (0, 0)),
                pl.BlockSpec((8, kp), lambda i: (0, 0)),
            ] + list(extra_specs),
            out_specs=[
                pl.BlockSpec((tile, F), lambda i: (i, 0)),
                pl.BlockSpec((tile, 1), lambda i: (i, 0)),
                pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, F), jnp.int32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.int32),
            ],
        )(x, cm.slab, cm.blk, *extra)
        return ids, lbov, cnt
    return go


def k_full(x_ref, slab_ref, blk_ref, ids_ref, lbov_ref, cnt_ref,
           *, kp, tile, F, nsub):
    sub = tile // nsub
    for m in range(nsub):
        xx = x_ref[m * sub:(m + 1) * sub, :]
        ids, lbov, cnt = pr._extract_math(xx, slab_ref[:, :], blk_ref, kp, F)
        ids_ref[m * sub:(m + 1) * sub, :] = ids
        lbov_ref[m * sub:(m + 1) * sub, :] = lbov
        cnt_ref[m * sub:(m + 1) * sub, :] = cnt


def k_slab_only(x_ref, slab_ref, blk_ref, ids_ref, lbov_ref, cnt_ref,
                *, kp, tile, F, nsub):
    sub = tile // nsub
    for m in range(nsub):
        xx = x_ref[m * sub:(m + 1) * sub, :]
        entry = wk._slab_entry_math(xx, slab_ref[:, :], blk_ref, kp)
        mn = jnp.min(entry, axis=1, keepdims=True)
        ids_ref[m * sub:(m + 1) * sub, :] = jnp.broadcast_to(
            mn.astype(jnp.int32), (sub, F))
        lbov_ref[m * sub:(m + 1) * sub, :] = mn
        cnt_ref[m * sub:(m + 1) * sub, :] = mn.astype(jnp.int32)


def k_sel_only(x_ref, slab_ref, blk_ref, ids_ref, lbov_ref, cnt_ref,
               *, kp, tile, F, nsub):
    sub = tile // nsub
    for m in range(nsub):
        xx = x_ref[m * sub:(m + 1) * sub, :]
        # fake entry: cheap broadcast of one feature against blk row
        entry = jnp.abs(xx[:, 0:1] * blk_ref[0:1, :]) + 1.0
        count = jnp.sum((entry < BIG).astype(jnp.int32), axis=1,
                        keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 1)
        lowmask = jnp.int32((1 << 10) - 1)
        key = (jax.lax.bitcast_convert_type(entry, jnp.int32) & ~lowmask) | cols
        big_key = jnp.int32(int(np.float32(BIG).view(np.int32)) & ~1023)
        dead = jnp.int32(0x7FFFFFFF)
        ids = []
        for _ in range(F):
            mn = jnp.min(key, axis=1, keepdims=True)
            ids.append(jnp.where(mn < big_key, mn & lowmask, jnp.int32(kp)))
            key = jnp.where(key == mn, dead, key)
        mn = jnp.min(key, axis=1, keepdims=True)
        lbov = jnp.where(
            mn < big_key,
            jax.lax.bitcast_convert_type(mn & ~lowmask, jnp.float32),
            jnp.float32(BIG))
        ids_ref[m * sub:(m + 1) * sub, :] = jnp.concatenate(ids, axis=1)
        lbov_ref[m * sub:(m + 1) * sub, :] = lbov
        cnt_ref[m * sub:(m + 1) * sub, :] = count


def k_mmbf16(x_ref, slab_ref, blk_ref, sw_ref, ids_ref, lbov_ref, cnt_ref,
             *, kp, tile, F, nsub):
    sub = tile // nsub
    for m in range(nsub):
        xx = x_ref[m * sub:(m + 1) * sub, :]
        prod = jax.lax.dot_general(
            xx.astype(jnp.bfloat16), sw_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t0c = xx[:, 6:7]
        actc = xx[:, 7:8] > 0.0
        tmin = jnp.full((sub, kp), -BIG, jnp.float32)
        tmax = jnp.full((sub, kp), BIG, jnp.float32)
        for a in range(3):
            oinv = xx[:, 11 + a:12 + a]
            tlo = prod[:, a * kp:(a + 1) * kp] - oinv
            thi = prod[:, (3 + a) * kp:(4 + a) * kp] - oinv
            tmin = jnp.maximum(tmin, jnp.minimum(tlo, thi))
            tmax = jnp.minimum(tmax, jnp.maximum(tlo, thi))
        slack = 1e-2 * jnp.abs(tmin) + 1e-3
        tmin = tmin - slack
        tmax = tmax + slack
        entry = jnp.maximum(tmin, 0.0)
        feasible = ((tmax >= entry) & (tmax > 0.0) & (entry < t0c) & actc
                    & (blk_ref[5:6, :] >= 0.0))
        entry = jnp.where(feasible, entry, BIG)
        count = jnp.sum((entry < BIG).astype(jnp.int32), axis=1,
                        keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 1)
        lowmask = jnp.int32((1 << 10) - 1)
        key = (jax.lax.bitcast_convert_type(entry, jnp.int32) & ~lowmask) | cols
        big_key = jnp.int32(int(np.float32(BIG).view(np.int32)) & ~1023)
        dead = jnp.int32(0x7FFFFFFF)
        ids = []
        for _ in range(F):
            mn = jnp.min(key, axis=1, keepdims=True)
            ids.append(jnp.where(mn < big_key, mn & lowmask, jnp.int32(kp)))
            key = jnp.where(key == mn, dead, key)
        mn = jnp.min(key, axis=1, keepdims=True)
        lbov = jnp.where(
            mn < big_key,
            jax.lax.bitcast_convert_type(mn & ~lowmask, jnp.float32),
            jnp.float32(BIG))
        ids_ref[m * sub:(m + 1) * sub, :] = jnp.concatenate(ids, axis=1)
        lbov_ref[m * sub:(m + 1) * sub, :] = lbov
        cnt_ref[m * sub:(m + 1) * sub, :] = count


go_full = run_variant(k_full)
go_slab = run_variant(k_slab_only)
go_sel = run_variant(k_sel_only)
go_full4 = run_variant(k_full, nsub=4)
go_full2 = run_variant(k_full, nsub=2)
go_bf = run_variant(
    k_mmbf16,
    extra_specs=[pl.BlockSpec((16, 6 * kp), lambda i: (0, 0))],
)

timeit("full", lambda c: c + 0.0 * go_full(c)[1], x)
timeit("slab_only", lambda c: c + 0.0 * go_slab(c)[1], x)
timeit("sel_only", lambda c: c + 0.0 * go_sel(c)[1], x)
timeit("full_sub4", lambda c: c + 0.0 * go_full4(c)[1], x)
timeit("full_sub2", lambda c: c + 0.0 * go_full2(c)[1], x)


@jax.jit
def bf(c):
    ids, lbov, cnt = go_bf(c, swb)
    return c + 0.0 * lbov

timeit("mmbf16", bf, x)

# sanity: bf16 feasible-count inflation vs f32
ids_a, lb_a, cnt_a = go_full(x)
ids_b, lb_b, cnt_b = go_bf(x, swb)
ca = np.asarray(cnt_a).ravel()
cb = np.asarray(cnt_b).ravel()
print(f"count f32 mean={ca.mean():.3f} bf16 mean={cb.mean():.3f} "
      f"bf16<f32: {(cb < ca).sum()} rows", flush=True)

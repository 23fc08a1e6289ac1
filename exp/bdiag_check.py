"""Equality check: block-diagonal supertile kernel vs runs kernel vs
oracle, on random pair sets (interpret mode on CPU, real on TPU)."""
import os, sys
sys.path.insert(0, "/root/repo")
if os.environ.get("CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
import jax.numpy as jnp

from kdtreepathtraceroptimization_tpu.ops import pairs as pr

interpret = jax.default_backend() != "tpu"
rng = np.random.default_rng(0)

block = 256
kreal = 37
kp = 40
P = 4096
ptile_b = 1024

# random MT weight blocks [kp, 16, 4*block]
w = jnp.asarray(rng.normal(size=(kp, 16, 4 * block)).astype(np.float32))
# sorted block ids with realistic runs: random segment lengths
ids = []
while sum(len(r) for r in ids) < P:
    b = rng.integers(0, kreal)
    ids.append([b] * int(rng.integers(1, 900)))
blk = np.sort(np.concatenate(ids)[:P]).astype(np.int32)
# sprinkle sentinels at the tail
blk[-57:] = kp
feat = rng.normal(size=(P, 16)).astype(np.float32)
feat[:, 10] = np.abs(feat[:, 10]) * 10  # t0 bound positive
feat = jnp.asarray(feat)
blk_s = jnp.asarray(blk)

p_runs = np.asarray(pr._pair_runs_pallas(blk_s, feat, w, block, 256, kreal,
                                         interpret))
p_bd = np.asarray(pr._pair_bdiag_pallas(blk_s, feat, w, block, ptile_b, kreal,
                                        interpret))
neq = int((p_runs != p_bd).sum())
print("runs vs bdiag mismatches:", neq, "/", P)
if neq:
    i = np.nonzero(p_runs != p_bd)[0][:10]
    print("first idx:", i, "blk:", blk[i])
    print("runs:", p_runs[i])
    print("bd  :", p_bd[i])
assert neq == 0
print("OK")

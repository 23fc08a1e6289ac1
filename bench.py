"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: rays/sec/chip on the reference's own headline config — the
Cornell box + the Stanford dragon (100k faces,
/root/reference/scenes/dragon.obj) at 800x800, depth 8, the scene the
reference's published table was measured on (BASELINE.md,
presentation/benchmarks.py). Falls back to a dragon-class procedural
icosphere when the reference mount is absent.

Intersector: the cluster-MXU path (ops/cluster.py) — Morton triangle
blocks culled by matmul sphere bounds and intersected on the MXU with
entry-ordered early exit; exact (brute-equal) results.

vs_baseline: the reference's short-stack GTX 980M result for the
closest mesh size, converted to rays/sec via
rays/sec = pixels * bounces / iteration-time (BASELINE.md).

Measurement notes (tunneled single-chip TPU):
- iterations are chained ON DEVICE inside one executable
  (make_render_block_fn) — each dispatch costs a ~50 ms tunnel round
  trip that would otherwise dominate;
- the bounce loop uses lax.scan (bit-identical to the unroll,
  tests/test_integrator.py) so the body compiles once — the depth-8
  unroll of the cluster kernels takes ~10 min on the remote compile
  helper;
- the whole timed block is repeated 3x and the best is kept: the
  tunneled pool is shared and run-to-run contention up to ~8x has
  been observed;
- only a host read of the film provably forces execution
  (block_until_ready alone has reported enqueue time here).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DRAGON = "/root/reference/scenes/dragon.obj"


def _mesh_scene(res, subdiv=None):
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    scene_path = os.path.join(os.path.dirname(__file__), "scenes", "cornell.txt")
    if subdiv is None and os.path.exists(DRAGON):
        scene = load_scene(scene_path, obj_path=DRAGON, build_kd=False)
        label = "dragon"
    else:
        import tempfile

        from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj

        verts, faces = icosphere(subdiv or 5, radius=2.5, center=(0.0, 3.0, 0.0))
        tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
        tmp.close()
        write_obj(tmp.name, verts, faces)
        scene = load_scene(scene_path, obj_path=tmp.name, build_kd=False)
        label = "icosphere"
    n_tris = int(scene.mesh.v0.shape[0])
    return with_resolution(scene, res, res), n_tris, label


def main():
    import jax
    import jax.numpy as jnp

    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    # Scale the benchmark to the platform so CI/CPU runs stay fast.
    if on_tpu:
        res, subdiv, iters, repeats = 800, None, 10, 3
    else:
        res, subdiv, iters, repeats = 200, 3, 3, 1
    scene, n_tris, label = _mesh_scene(res, subdiv)
    depth = 8
    config = RenderConfig(trace_depth=depth, antialias=True, cluster=True,
                          scan_bounces=True)

    block = make_render_block_fn(scene, config, iters)
    n = res * res
    key = jax.random.PRNGKey(0)

    # warmup/compile
    film = block(jnp.zeros((n, 3), jnp.float32), key, jnp.int32(1))
    float(film[0, 0])

    best = float("inf")
    it0 = 1 + iters
    for _ in range(repeats):
        film = jnp.zeros((n, 3), jnp.float32)
        t0 = time.perf_counter()
        film = block(film, key, jnp.int32(it0))
        float(film[0, 0])  # forces execution (see module docstring)
        best = min(best, (time.perf_counter() - t0) / iters)
        it0 += iters
    dt = best

    # rays/sec: every pixel traces up to `depth` bounces; count launched
    # bounce-rays (pixels * depth) to match the reference's kernel-time
    # basis (all paths resident every bounce, no compaction).
    rays_per_sec = n * depth / dt

    # Baseline conversion (BASELINE.md): dragon.obj is 50k verts /
    # 100k faces — between the table's 37.5k-vert (79.4 ms) and
    # 75k-vert (118.3 ms) short-stack rows; use the STRONGER (faster)
    # 37.5k row so vs_baseline is conservative. The icosphere fallback
    # (20k tris) maps to the 18.4k-vert row (59.0 ms).
    ref_ms = 79.4 if label == "dragon" else 59.0
    ref_rays_per_sec = 800 * 800 * 8 / (ref_ms / 1e3)

    out = {
        "metric": f"rays/sec/chip (cornell+{label} {n_tris}tris, {res}x{res}, "
                  f"depth {depth}, cluster-MXU)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / ref_rays_per_sec, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

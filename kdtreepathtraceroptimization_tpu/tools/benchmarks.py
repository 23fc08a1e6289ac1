"""Benchmark sweep reproducing the reference's published table shape.

The reference hand-pasted cudaEvent timings into
presentation/benchmarks.py as matrices of 10 runs x 4 modes
{bruteforce, bounding box, kd-tree, short-stack kd} x 8 mesh
resolutions (reference: presentation/benchmarks.py:27-381, README
table — SURVEY.md §6). This tool *measures* the same sweep live:
a Cornell box + procedural icosphere at growing subdivision levels,
rendered in each traversal mode, reporting mean ms/iteration.

Usage:
    python -m kdtreepathtraceroptimization_tpu.tools.benchmarks \
        [--res 800] [--iters 10] [--depth 8] [--subdiv 2 3 4 5] \
        [--modes brute bbox kd short] [--json out.json]

Each row prints as it completes; the final table mirrors SURVEY.md §6
so the two are directly comparable (lower is better).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


MODES = {
    # name -> RenderConfig overrides. 'brute' is the MXU det-form
    # kernel; 'bbox' must take the streaming VPU path (mxu_brute=False)
    # because intersect_mesh_mxu ignores per-shape AABB culling — with
    # the default the two rows would silently measure the same code.
    "brute": dict(enable_kd=False, use_bbox=False),
    "bbox": dict(enable_kd=False, use_bbox=True, mxu_brute=False),
    "kd": dict(enable_kd=True, short_stack=False),
    "short": dict(enable_kd=True, short_stack=True),
    # The TPU-native intersectors — no reference counterpart; included
    # so the sweep shows where each crosses the KD walks.
    "cluster": dict(cluster=True, cluster_walk=False, cluster_pairs=False),
    "walk": dict(cluster=True, cluster_walk=True, cluster_pairs=False),
    "pairs": dict(cluster=True, cluster_pairs=True),
}


# The dragon sweep needs a high-poly OBJ which is not shipped with the
# repo; point KDPT_DRAGON_OBJ at one (e.g. a Stanford-dragon mesh).
DRAGON = os.environ.get("KDPT_DRAGON_OBJ", "")


def _cornell_path():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "scenes",
        "cornell.txt",
    )


def _scene(res: int, subdiv: int):
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
    from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj

    verts, faces = icosphere(subdiv, radius=2.5, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene = load_scene(_cornell_path(), obj_path=tmp.name)
    os.unlink(tmp.name)
    return with_resolution(scene, res, res), len(faces), len(verts)


def _dragon_scene(res: int, n_faces: int):
    """Cornell + the reference's dragon mesh subsampled to ~n_faces
    (every k-th face, all vertices kept — a crude decimation that
    preserves the perf-vs-triangle-count axis the sweep measures)."""
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    if not DRAGON or not os.path.exists(DRAGON):
        raise SystemExit(
            "dragon sweep: set KDPT_DRAGON_OBJ to a high-poly OBJ path "
            f"(got {DRAGON!r})"
        )
    faces = []
    vlines = []
    with open(DRAGON) as f:
        for line in f:
            if line.startswith("v "):
                vlines.append(line)
            elif line.startswith("f "):
                faces.append(line)
    k = max(1, len(faces) // n_faces)
    faces = faces[::k]
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.writelines(vlines)
    tmp.writelines(faces)
    tmp.close()
    scene = load_scene(_cornell_path(), obj_path=tmp.name)
    os.unlink(tmp.name)
    return (with_resolution(scene, res, res), int(scene.mesh.v0.shape[0]),
            len(vlines))


def time_mode(scene, mode: str, res: int, iters: int, depth: int,
              repeats: int = 3) -> float:
    """Best steady-state ms/iteration for one traversal mode.

    Iterations run on-device inside one executable (a dispatch over the
    tunneled chip costs ~50 ms) and the block repeats ``repeats`` times
    keeping the best — the shared pool shows large contention variance.
    Only a host read provably forces execution here."""
    import jax
    import jax.numpy as jnp

    from kdtreepathtraceroptimization_tpu.config import RenderConfig
    from kdtreepathtraceroptimization_tpu.render.integrator import make_render_block_fn

    config = RenderConfig(trace_depth=depth, antialias=True,
                          scan_bounces=True, **MODES[mode])
    block = make_render_block_fn(scene, config, iters)
    key = jax.random.PRNGKey(0)
    film = block(jnp.zeros((res * res, 3), jnp.float32), key, jnp.int32(1))
    float(film[0, 0])  # compile + warm
    best = float("inf")
    it0 = 1 + iters
    for _ in range(repeats):
        film = jnp.zeros((res * res, 3), jnp.float32)
        t0 = time.perf_counter()
        film = block(film, key, jnp.int32(it0))
        float(film[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        it0 += iters
    return best


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--res", type=int, default=None,
                   help="image resolution (default 800 on TPU, 200 on CPU)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--subdiv", type=int, nargs="+", default=None,
                   help="icosphere subdivision levels (tris = 20*4^s)")
    p.add_argument("--modes", nargs="+", default=list(MODES),
                   choices=list(MODES))
    p.add_argument("--dragon", type=int, nargs="*", default=None,
                   help="extra rows: the reference dragon subsampled to "
                        "these face counts (requires the reference mount)")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default=None, help="also write results as JSON")
    args = p.parse_args(argv)

    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    res = args.res or (800 if on_tpu else 200)
    subdivs = args.subdiv or ([2, 3, 4, 5] if on_tpu else [1, 2])

    cases = [("icosphere", s) for s in subdivs]
    if args.dragon is not None:
        cases += [("dragon", nf) for nf in (args.dragon or [100000])]

    rows = []
    header = ["mesh (tris/verts)"] + [m for m in args.modes]
    print("  ".join(f"{h:>18}" for h in header))
    for kind, s in cases:
        if kind == "dragon":
            scene, n_tris, n_verts = _dragon_scene(res, s)
            row = {"mesh": f"dragon_{s}", "tris": n_tris, "verts": n_verts,
                   "res": res, "depth": args.depth, "ms": {}}
        else:
            scene, n_tris, n_verts = _scene(res, s)
            row = {"subdiv": s, "tris": n_tris, "verts": n_verts, "res": res,
                   "depth": args.depth, "ms": {}}
        cells = [f"{n_tris}/{n_verts}"]
        for mode in args.modes:
            # brute force past ~20k tris is the reference's crash row
            # (README.md:208-209) — here it just gets slow; skip above 100k.
            if mode in ("brute", "bbox") and n_tris > 100_000:
                row["ms"][mode] = None
                cells.append("skip")
                continue
            ms = time_mode(scene, mode, res, args.iters, args.depth,
                           repeats=args.repeats)
            row["ms"][mode] = round(ms, 2)
            cells.append(f"{ms:.1f}ms")
            print("  ".join(f"{c:>18}" for c in cells), end="\r", flush=True)
        rows.append(row)
        print("  ".join(f"{c:>18}" for c in cells))
        if args.json:  # write incrementally: a timeout keeps the rows done
            with open(args.json, "w") as f:
                json.dump({"res": res, "iters": args.iters, "rows": rows},
                          f, indent=2)

    if args.json:
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

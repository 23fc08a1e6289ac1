"""Golden-image harness: case definitions + regeneration tool.

The golden tests (tests/test_golden.py) render small fixed-seed images
and compare against committed .npy goldens, failing on any regression —
the automated version of the reference's manual "diff two traversal
modes / eyeball the render" workflow (SURVEY.md §4). Regenerate after an
INTENDED image change with:

    python -m kdtreepathtraceroptimization_tpu.tools.goldens [outdir]

Run on the CPU backend (tests force it; goldens are committed from CPU
renders — TPU renders match within the cross-mode tolerance, not bit-
exactly).
"""

from __future__ import annotations

import os

import numpy as np

from kdtreepathtraceroptimization_tpu.config import RenderConfig

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN_DIR = os.path.join(_REPO, "tests", "goldens")
REFERENCE_CORNELL = "/root/reference/scenes/cornell.txt"
REFERENCE_RENDER = "/root/reference/img/REFERENCE_cornell.5000samp.png"


def _cornell_scene(res):
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution

    scene = load_scene(os.path.join(_REPO, "scenes", "cornell.txt"))
    return with_resolution(scene, res, res)


def _mesh_scene(res, subdiv=2):
    import tempfile

    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
    from kdtreepathtraceroptimization_tpu.utils.procmesh import icosphere, write_obj

    verts, faces = icosphere(subdiv, radius=2.0, center=(0.0, 3.0, 0.0))
    tmp = tempfile.NamedTemporaryFile(suffix=".obj", delete=False, mode="w")
    tmp.close()
    write_obj(tmp.name, verts, faces)
    scene = load_scene(os.path.join(_REPO, "scenes", "cornell.txt"), obj_path=tmp.name)
    return with_resolution(scene, res, res)


# name -> (scene builder, config, spp). Deterministic: fixed seed 0,
# no AA jitter reuse issues (AA on is fine — the RNG is counter-based).
CASES = {
    "cornell_64": (
        lambda: _cornell_scene(64),
        RenderConfig(trace_depth=8, antialias=True),
        8,
    ),
    "cornell_spec_64": (
        lambda: _cornell_scene(64),
        RenderConfig(trace_depth=8, antialias=False, enable_sss=True),
        8,
    ),
    "mesh_kd_48": (
        lambda: _mesh_scene(48),
        RenderConfig(trace_depth=4, enable_kd=True),
        8,
    ),
    # The PRODUCTION pair-list path at mesh scale (5k tris): the golden
    # fails if the pair pipeline's exactness chain (extraction -> runs
    # kernel -> proof passes) regresses (VERDICT r3 item 7).
    "mesh_pairs_48": (
        lambda: _mesh_scene(48, subdiv=4),
        RenderConfig(trace_depth=4, cluster=True, cluster_pairs=True,
                     cluster_tile=256),
        8,
    ),
}


def render_case(name):
    builder, config, spp = CASES[name]
    from kdtreepathtraceroptimization_tpu.render.integrator import render

    return np.asarray(render(builder(), config, spp=spp, seed=0))


def main(outdir=GOLDEN_DIR):
    # Drift guard: goldens are committed from CPU renders (the tests
    # force the CPU backend); regenerating on a TPU/axon backend would
    # silently commit mismatched pins.
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    os.makedirs(outdir, exist_ok=True)
    for name in CASES:
        img = render_case(name)
        path = os.path.join(outdir, f"{name}.npy")
        np.save(path, img.astype(np.float32))
        print(f"wrote {path}  shape={img.shape} mean={img.mean():.4f}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else GOLDEN_DIR)

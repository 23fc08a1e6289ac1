"""Golden-image regression + reference-render parity checks.

The automated replacement for the reference's manual verification
workflow (SURVEY.md §4: "image-diff two traversal modes", "eyeball the
render"): committed goldens catch ANY unintended image change; the
cross-mode tests pin brute/KD/packet agreement; the reference-render
test checks structure against the render the reference ships
(/root/reference/img/REFERENCE_cornell.5000samp.png, README.md:163-181).

Note on reference tolerance: the reference's own committed renders of
the SAME scene span mean brightness 0.001-0.34 (different dev stages and
toggle settings — measured over img/cornell.2016-09-30*.png), so strict
1e-2/pixel parity against any one of them is not meaningful. Our render
matches their late-stage cornell.2016-09-30_19-28-12z render within
0.005 mean; against REFERENCE_cornell the test asserts structure
(orientation, wall hues, per-pixel correlation), documented here.
"""

import os

import numpy as np
import pytest

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import render
from kdtreepathtraceroptimization_tpu.tools.goldens import (
    CASES,
    GOLDEN_DIR,
    REFERENCE_CORNELL,
    REFERENCE_RENDER,
    render_case,
)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_regression(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    assert os.path.exists(path), (
        f"golden {name} missing — regenerate with "
        "python -m kdtreepathtraceroptimization_tpu.tools.goldens"
    )
    golden = np.load(path)
    img = render_case(name)
    assert img.shape == golden.shape
    np.testing.assert_allclose(
        img, golden, atol=2e-3,
        err_msg=f"{name} diverged from committed golden — if the image "
        "change is intended, regenerate goldens",
    )


def test_cross_mode_golden_agreement():
    """brute (VPU), brute (MXU), KD per-ray, KD packet, and the three
    cluster-family intersectors (pairs/walk/binned): seven independent
    intersectors within 1e-2 mean of each other on the mesh golden
    (BASELINE.json 'matching RGB within 1e-2'; the reference's de-facto
    test was diffing traversal modes, README.md:148-151)."""
    from kdtreepathtraceroptimization_tpu.tools.goldens import _mesh_scene

    scene = _mesh_scene(48)
    spp = 8
    cbase = dict(trace_depth=4, cluster=True, cluster_tile=256)
    imgs = {
        "kd": np.asarray(render(scene, RenderConfig(trace_depth=4), spp=spp, seed=0)),
        "pairs": np.asarray(
            render(scene, RenderConfig(**cbase, cluster_pairs=True),
                   spp=spp, seed=0)
        ),
        "walk": np.asarray(
            render(scene, RenderConfig(**cbase, cluster_pairs=False,
                                       cluster_walk=True),
                   spp=spp, seed=0)
        ),
        "binned": np.asarray(
            render(scene, RenderConfig(**cbase, cluster_pairs=False,
                                       cluster_binned=True, binned_rounds=8),
                   spp=spp, seed=0)
        ),
        "kd_packet": np.asarray(
            render(scene, RenderConfig(trace_depth=4, packet_size=32), spp=spp, seed=0)
        ),
        "brute_mxu": np.asarray(
            render(scene, RenderConfig(trace_depth=4, enable_kd=False), spp=spp, seed=0)
        ),
        "brute_vpu": np.asarray(
            render(
                scene,
                RenderConfig(trace_depth=4, enable_kd=False, mxu_brute=False),
                spp=spp,
                seed=0,
            )
        ),
    }
    base = imgs.pop("kd")
    for name, img in imgs.items():
        diff = np.abs(img - base)
        assert diff.mean() < 0.01, f"{name} vs kd mean diff {diff.mean()}"


@pytest.mark.skipif(
    not (os.path.exists(REFERENCE_CORNELL) and os.path.exists(REFERENCE_RENDER)),
    reason="reference mount unavailable",
)
def test_reference_render_structure():
    """Render the reference's own cornell.txt and compare against its
    shipped 5000-sample render: same orientation, same wall hues, high
    per-pixel correlation. (Strict parity impossible — see module
    docstring.)"""
    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene, with_resolution
    from kdtreepathtraceroptimization_tpu.utils.image import read_png

    # spp sets the correlation floor (MC noise): measured 0.80 @ 48,
    # 0.905 @ 192, 0.937 @ 512 — 192 clears the 0.85 bar with margin.
    scene = with_resolution(load_scene(REFERENCE_CORNELL), 50, 50)
    img = np.asarray(
        render(scene, RenderConfig(trace_depth=8, antialias=True), spp=192, seed=0)
    )
    ref = read_png(REFERENCE_RENDER).astype(np.float32) / 255.0
    ref = ref.reshape(50, 16, 50, 16, 3).mean(axis=(1, 3))

    ours = np.clip(img, 0.0, 1.0)
    # orientation: the un-flipped alignment must beat all three flips
    def mad(a):
        return float(np.abs(a - ref).mean())

    base = mad(ours)
    assert base < mad(ours[:, ::-1])
    assert base < mad(ours[::-1])
    assert base < mad(ours[::-1, ::-1])
    assert base < 0.08, f"mean abs diff vs reference render {base}"

    # wall hues (left red, right green) in both images
    for im in (ours, ref):
        left = im[20:30, 1:6].mean(axis=(0, 1))
        right = im[20:30, 44:49].mean(axis=(0, 1))
        assert left[0] > left[1]
        assert right[1] > right[0]

    # per-pixel luminance correlation
    a = ours.mean(axis=2).ravel()
    b = ref.mean(axis=2).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.85, f"luminance correlation {corr}"

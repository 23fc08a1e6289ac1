"""End-to-end integrator tests: determinism, structure, physical sanity."""

import jax
import numpy as np

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.integrator import render
from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution


def _small(cornell_scene, n=64):
    return with_resolution(cornell_scene, n, n)


def test_render_deterministic(cornell_scene):
    scene = _small(cornell_scene, 32)
    cfg = RenderConfig(trace_depth=4)
    a = np.asarray(render(scene, cfg, spp=2, seed=0))
    b = np.asarray(render(scene, cfg, spp=2, seed=0))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(scene, cfg, spp=2, seed=1))
    assert np.abs(a - c).max() > 0  # different seed, different noise


def test_render_structure(cornell_scene):
    scene = _small(cornell_scene, 64)
    cfg = RenderConfig(trace_depth=8, antialias=False)
    img = np.asarray(render(scene, cfg, spp=32, seed=0))
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # left third should be redder than green; right third greener than red
    left = img[:, 8:20].mean(axis=(0, 1))
    right = img[:, 44:56].mean(axis=(0, 1))
    assert left[0] > left[1], f"left wall not red-dominant: {left}"
    assert right[1] > right[0], f"right wall not green-dominant: {right}"
    # the light region (projected: ceiling light spans rows ~15-19,
    # cols ~28-36 at 64x64 with this camera) outshines the floor
    light = img[15:19, 29:35].mean()
    floor = img[50:60, 24:40].mean()
    assert light > floor


def test_render_dof_and_aa_change_image(cornell_scene):
    scene = _small(cornell_scene, 32)
    base = np.asarray(render(scene, RenderConfig(trace_depth=2), spp=1, seed=0))
    aa = np.asarray(
        render(scene, RenderConfig(trace_depth=2, antialias=True), spp=1, seed=0)
    )
    dof = np.asarray(
        render(scene, RenderConfig(trace_depth=2, dof_angle=0.05), spp=1, seed=0)
    )
    assert np.abs(base - aa).max() > 0
    assert np.abs(base - dof).max() > 0


def test_specular_scene_runs():
    import os

    from kdtreepathtraceroptimization_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell_spheres.txt")
    scene = with_resolution(load_scene(path), 48, 48)
    cfg = RenderConfig(trace_depth=8, enable_sss=True)
    img = np.asarray(render(scene, cfg, spp=4, seed=0))
    assert np.isfinite(img).all()
    assert img.max() > 0


def test_compaction_and_sort_match_baseline(cornell_scene):
    """RNG streams are pixel-keyed, so permuting the wavefront
    (compaction / material sort) must not change the image at all."""
    scene = _small(cornell_scene, 32)
    base = np.asarray(render(scene, RenderConfig(trace_depth=4), spp=2, seed=0))
    comp = np.asarray(
        render(scene, RenderConfig(trace_depth=4, compaction=True), spp=2, seed=0)
    )
    srt = np.asarray(
        render(scene, RenderConfig(trace_depth=4, material_sort=True), spp=2, seed=0)
    )
    np.testing.assert_array_equal(base, comp)
    np.testing.assert_array_equal(base, srt)


def test_scan_bounces_bit_identical(cornell_scene):
    """config.scan_bounces compiles the bounce body once (lax.scan) —
    the image must be bit-identical to the default Python unroll (the
    CLI/bench forward paths rely on this equivalence)."""
    scene = _small(cornell_scene, 32)
    a = np.asarray(render(scene, RenderConfig(trace_depth=8), spp=2, seed=0))
    b = np.asarray(
        render(scene, RenderConfig(trace_depth=8, scan_bounces=True), spp=2, seed=0)
    )
    np.testing.assert_array_equal(a, b)


def test_termview_ansi_preview():
    """The live terminal preview (utils/termview.py): shape, gamma, and
    escape-sequence structure — the headless stand-in for the
    reference's GL convergence window."""
    import numpy as np

    from kdtreepathtraceroptimization_tpu.utils.termview import (
        ansi_preview, live_frame,
    )

    img = np.zeros((32, 64, 3), np.float32)
    img[:16] = [1.0, 0.0, 0.0]   # top half red
    img[16:] = [0.0, 1.0, 0.0]   # bottom half green
    art = ansi_preview(img, cols=32)
    lines = art.splitlines()
    # 64 -> 32 cols downsamples 2x in BOTH axes: 16 rows -> 8 text rows
    assert len(lines) == 8
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert "38;2;255;0;0" in lines[0] and "48;2;255;0;0" in lines[0]
    assert "38;2;0;255;0" in lines[-1]

    frame0 = live_frame(img.reshape(-1, 3), 1, 32, 64, cols=32, first=True)
    frame1 = live_frame(img.reshape(-1, 3), 2, 32, 64, cols=32)
    rewind = f"\x1b[{art.count(chr(10)) + 2}F"
    assert not frame0.startswith(rewind)  # no rewind on the first frame
    assert frame1.startswith(rewind)       # art rows + status line
    assert "iter 2" in frame1


def test_sort_rays_by_octant_groups_and_preserves():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kdtreepathtraceroptimization_tpu.ops import vecmath as vm
    from kdtreepathtraceroptimization_tpu.ops.camera import RaySoA
    from kdtreepathtraceroptimization_tpu.ops.compaction import (
        sort_rays_by_octant,
    )

    rng = np.random.default_rng(1)
    n = 256
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays = RaySoA(
        origin=vm.v3_from_rows(jnp.zeros((n, 3), jnp.float32)),
        direction=vm.v3_from_rows(jnp.asarray(d)),
        color=vm.v3_from_rows(jnp.ones((n, 3), jnp.float32)),
        is_inside=jnp.zeros((n,), bool),
        sdepth=jnp.zeros((n,), jnp.float32),
        pixel_index=jnp.arange(n, dtype=jnp.int32),
        remaining_bounces=jnp.where(jnp.arange(n) % 5 == 0, 0, 3),
    )
    out = jax.jit(sort_rays_by_octant)(rays)
    # permutation: every pixel index present exactly once
    np.testing.assert_array_equal(
        np.sort(np.asarray(out.pixel_index)), np.arange(n)
    )
    od = np.asarray(vm.v3_to_rows(out.direction))
    oct_ = ((od[:, 0] >= 0) + 2 * (od[:, 1] >= 0)
            + 4 * (od[:, 2] >= 0)).astype(int)
    alive = np.asarray(out.remaining_bounces) > 0
    # alive rays come first, grouped by nondecreasing octant
    assert alive[: alive.sum()].all() and not alive[alive.sum():].any()
    assert (np.diff(oct_[: alive.sum()]) >= 0).all()


def test_pad_to_devices():
    from kdtreepathtraceroptimization_tpu.parallel.sharding import (
        pad_to_devices,
    )

    assert pad_to_devices(1024, 8) == 1024
    assert pad_to_devices(1001, 8) == 1008
    assert pad_to_devices(1, 8) == 8

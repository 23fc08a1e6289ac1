"""Interactive controller state machine (reference main.cpp:1110-1343):
camera-change -> film-reset transition, toggle semantics, and an
end-to-end non-tty run through the CLI loop."""

import numpy as np

from kdtreepathtraceroptimization_tpu.config import RenderConfig
from kdtreepathtraceroptimization_tpu.render.interactive import apply_key
from kdtreepathtraceroptimization_tpu.scene.parser import with_resolution


def _cam(cornell_scene):
    return with_resolution(cornell_scene, 16, 16).camera


def test_orbit_resets_film(cornell_scene):
    cam = _cam(cornell_scene)
    cfg = RenderConfig(trace_depth=2)
    r = apply_key("LEFT", cam, cfg)
    assert r.reset_film and not r.recompile
    assert not np.allclose(np.asarray(r.camera.position),
                           np.asarray(cam.position))
    # look_at preserved by orbit
    np.testing.assert_allclose(np.asarray(r.camera.look_at),
                               np.asarray(cam.look_at), atol=1e-6)
    # radius preserved by pure orbit
    r0 = np.linalg.norm(np.asarray(cam.position) - np.asarray(cam.look_at))
    r1 = np.linalg.norm(np.asarray(r.camera.position)
                        - np.asarray(r.camera.look_at))
    np.testing.assert_allclose(r1, r0, rtol=1e-5)


def test_zoom_changes_radius(cornell_scene):
    cam = _cam(cornell_scene)
    cfg = RenderConfig(trace_depth=2)
    r = apply_key("+", cam, cfg)
    assert r.reset_film
    r0 = np.linalg.norm(np.asarray(cam.position) - np.asarray(cam.look_at))
    r1 = np.linalg.norm(np.asarray(r.camera.position)
                        - np.asarray(r.camera.look_at))
    assert r1 < r0


def test_pan_moves_lookat(cornell_scene):
    cam = _cam(cornell_scene)
    cfg = RenderConfig(trace_depth=2)
    r = apply_key("d", cam, cfg)
    assert r.reset_film
    assert not np.allclose(np.asarray(r.camera.look_at),
                           np.asarray(cam.look_at))


def test_toggles_keep_film_but_recompile(cornell_scene):
    cam = _cam(cornell_scene)
    cfg = RenderConfig(trace_depth=2)
    r = apply_key("A", cam, cfg)
    assert not r.reset_film and r.recompile  # reference: toggles don't reset
    assert r.config.antialias != cfg.antialias
    r2 = apply_key("K", cam, cfg)
    assert r2.config.enable_kd != cfg.enable_kd
    # lowercase k orbits, it must NOT toggle enable_kd
    r3 = apply_key("k", cam, cfg)
    assert r3.config.enable_kd == cfg.enable_kd and r3.reset_film


def test_unknown_key_noop(cornell_scene):
    cam = _cam(cornell_scene)
    cfg = RenderConfig(trace_depth=2)
    r = apply_key("z", cam, cfg)
    assert r.camera is cam and r.config is cfg
    assert not r.reset_film and not r.recompile and r.action == ""


def test_quit_and_save_actions(cornell_scene):
    cam = _cam(cornell_scene)
    cfg = RenderConfig(trace_depth=2)
    assert apply_key("q", cam, cfg).action == "quit"
    assert apply_key("ESC", cam, cfg).action == "quit"
    assert apply_key("S", cam, cfg).action == "save"


def test_run_interactive_non_tty(cornell_scene, tmp_path, monkeypatch):
    """End-to-end loop without a tty: renders max_iters iterations and
    saves through save_fn."""
    from kdtreepathtraceroptimization_tpu.render import interactive as ia

    scene = with_resolution(cornell_scene, 16, 16)
    cfg = RenderConfig(trace_depth=2)
    saved = {}

    def save_fn(img, it):
        saved["img"] = img
        saved["it"] = it

    # no keys available
    monkeypatch.setattr(ia, "_read_key", lambda timeout_s: None)
    accum, it = ia.run_interactive(scene, cfg, 0, save_fn, cols=16,
                                   max_iters=3)
    assert it == 3 and saved["it"] == 3
    assert np.isfinite(saved["img"]).all() and saved["img"].max() > 0


def test_run_interactive_camera_reset(cornell_scene, monkeypatch):
    """A camera key mid-run resets the accumulation to iteration 0."""
    from kdtreepathtraceroptimization_tpu.render import interactive as ia

    scene = with_resolution(cornell_scene, 16, 16)
    cfg = RenderConfig(trace_depth=2)
    keys = iter([None, "LEFT", None, None, None, None])

    def fake_read(timeout_s):
        try:
            return next(keys)
        except StopIteration:
            return "q"

    monkeypatch.setattr(ia, "_read_key", fake_read)
    saved = {}
    accum, it = ia.run_interactive(
        scene, cfg, 0, lambda img, i: saved.update(it=i), cols=16)
    # 2 iterations ran, LEFT reset to 0, then 4 no-key iterations and a
    # 5th that reads the quit — the reset is visible as it << 7 total
    assert saved["it"] == it == 5

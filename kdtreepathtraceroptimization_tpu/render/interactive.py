"""Interactive render loop — the reference's keyboard/mouse controller.

Re-design of main.cpp's GLFW callbacks + runCuda camera controller
(/root/reference/src/main.cpp:1110-1343): keyboard orbit/pan/zoom with
film reset on camera change, the runtime feature toggles, and live
ANSI preview frames in place of the GL window (L5 is headless by
design — see cli.py). The state machine is pure so the
camera-change -> film-reset transition is unit-testable
(tests/test_interactive.py); the terminal/stdin plumbing lives in
``run_interactive``.

Key bindings (reference: README.md:14-40, main.cpp:1187-1343):

  arrows / hjkl   orbit (phi/theta)            mouse-drag analog
  + / -           zoom in / out                scroll analog
  w a s d         pan (view plane)             right-drag analog
  [ / ]           focal length down / up
  , / .           depth-of-field blur down / up
  A C X F M K L B toggles: antialias, ray cache, SSS, compaction,
                  material sort, KD on/off, short-stack, bbox cull
  S               save PNG now
  q / Esc         save and quit

As in the reference, a CAMERA change restarts accumulation from
iteration 0 (camchanged -> iteration = 0, main.cpp:1111-1137) while
feature toggles keep accumulating into the running film (the reference
flips its globals mid-render without clearing dev_image).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

ORBIT_STEP = 0.12        # radians per keypress (arrow-key mouse analog)
ZOOM_STEP = 0.4
PAN_STEP = 0.25
FOCAL_STEP = 0.5
DOF_STEP = 0.05

_TOGGLES = {
    "a": "antialias",
    "c": "ray_cache",
    "x": "enable_sss",
    "f": "compaction",
    "m": "material_sort",
    "K": "enable_kd",
    "L": "short_stack",
    "b": "use_bbox",
}


class KeyResult(NamedTuple):
    camera: object            # scene Camera (possibly replaced)
    config: object            # RenderConfig (possibly replaced)
    reset_film: bool          # camera changed -> restart accumulation
    recompile: bool           # config changed -> rebuild the step fn
    action: str               # "", "save", "quit", or a description


def apply_key(key: str, camera, config) -> KeyResult:
    """Pure controller step: one key -> (camera, config, transitions).

    Mirrors keyCallback + the runCuda camera rebuild
    (main.cpp:1187-1343, 1110-1137). Unknown keys are no-ops.
    """
    from kdtreepathtraceroptimization_tpu.ops.camera import (
        orbit_camera,
        pan_camera,
    )

    # --- camera motion: film resets (camchanged) ----------------------
    orbit = {
        "LEFT": (-ORBIT_STEP, 0.0, 0.0), "RIGHT": (ORBIT_STEP, 0.0, 0.0),
        "UP": (0.0, -ORBIT_STEP, 0.0), "DOWN": (0.0, ORBIT_STEP, 0.0),
        "h": (-ORBIT_STEP, 0.0, 0.0), "l": (ORBIT_STEP, 0.0, 0.0),
        "k": (0.0, -ORBIT_STEP, 0.0), "j": (0.0, ORBIT_STEP, 0.0),
        "+": (0.0, 0.0, -ZOOM_STEP), "=": (0.0, 0.0, -ZOOM_STEP),
        "-": (0.0, 0.0, ZOOM_STEP),
    }
    if key in orbit:
        d_phi, d_theta, d_zoom = orbit[key]
        cam = orbit_camera(camera, d_phi=d_phi, d_theta=d_theta,
                           d_zoom=d_zoom)
        return KeyResult(cam, config, True, False, f"orbit {key}")

    pan = {
        "a": (-PAN_STEP, 0.0), "d": (PAN_STEP, 0.0),
        "w": (0.0, PAN_STEP), "s": (0.0, -PAN_STEP),
    }
    if key in pan:
        dx, dy = pan[key]
        cam = pan_camera(camera, dx=dx, dy=dy)
        return KeyResult(cam, config, True, False, f"pan {key}")

    # --- lens parameters: live in the config -> recompile, reset ------
    if key in ("[", "]"):
        f = max(0.5, config.focal_length
                + (FOCAL_STEP if key == "]" else -FOCAL_STEP))
        cfg = dataclasses.replace(config, focal_length=f)
        return KeyResult(camera, cfg, True, True, f"focal={f:g}")
    if key in (",", "."):
        d = max(0.0, config.dof_angle
                + (DOF_STEP if key == "." else -DOF_STEP))
        cfg = dataclasses.replace(config, dof_angle=d)
        return KeyResult(camera, cfg, True, True, f"dof={d:g}")

    # --- feature toggles: keep accumulating (reference behavior) ------
    tk = key if key in _TOGGLES else key.lower()
    # K/L are uppercase-only to keep hjkl orbit free
    if key in ("A", "C", "X", "F", "M", "B"):
        tk = key.lower()
    if tk in _TOGGLES and (key in ("K", "L") or key not in ("k", "l")):
        field = _TOGGLES[tk]
        cfg = dataclasses.replace(config, **{field: not getattr(config, field)})
        return KeyResult(camera, cfg, False, True,
                         f"{field}={getattr(cfg, field)}")

    if key in ("S",):
        return KeyResult(camera, config, False, False, "save")
    if key in ("q", "Q", "ESC"):
        return KeyResult(camera, config, False, False, "quit")
    return KeyResult(camera, config, False, False, "")


def _read_key(timeout_s: float) -> Optional[str]:
    """One key from a raw terminal (arrow escape sequences decoded),
    or None on timeout / non-tty EOF."""
    import os
    import select
    import sys

    r, _, _ = select.select([sys.stdin], [], [], timeout_s)
    if not r:
        return None
    ch = os.read(sys.stdin.fileno(), 1).decode(errors="replace")
    if ch == "\x1b":  # escape sequence (arrows) or bare Esc
        r, _, _ = select.select([sys.stdin], [], [], 0.01)
        if not r:
            return "ESC"
        seq = os.read(sys.stdin.fileno(), 2).decode(errors="replace")
        return {"[A": "UP", "[B": "DOWN", "[C": "RIGHT",
                "[D": "LEFT"}.get(seq, "")
    if ch in ("", "\x04"):
        return "ESC"
    return ch


def run_interactive(scene, config, seed: int, save_fn, cols: int = 64,
                    max_iters: int = 0) -> Tuple[object, int]:
    """Terminal interactive loop: render iterations continuously,
    polling stdin for keys between iterations; redraw the ANSI preview
    each iteration. Returns (final accumulated film, iterations).

    ``save_fn(accum_np, iteration)`` writes the current image. The
    terminal is put in cbreak mode when stdin is a tty; otherwise keys
    are read line-buffered (useful for piped scripting/tests).
    """
    import sys
    import termios
    import tty

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kdtreepathtraceroptimization_tpu.render.integrator import (
        make_render_fn,
    )
    from kdtreepathtraceroptimization_tpu.scene.parser import replace_camera
    from kdtreepathtraceroptimization_tpu.utils.termview import live_frame

    res_x = int(scene.camera.resolution[0])
    res_y = int(scene.camera.resolution[1])
    n = res_x * res_y
    camera = scene.camera
    key0 = jax.random.PRNGKey(seed)

    is_tty = sys.stdin.isatty()
    old_attrs = None
    if is_tty:
        old_attrs = termios.tcgetattr(sys.stdin)
        tty.setcbreak(sys.stdin.fileno())
    print("interactive: arrows/hjkl orbit, +/- zoom, wasd pan, "
          "A C X F M K L B toggles, S save, q quit", flush=True)
    try:
        step = make_render_fn(replace_camera(scene, camera), config)
        accum = jnp.zeros((n, 3), jnp.float32)
        it = 0
        first = True
        while True:
            it += 1
            accum = step(accum, key0, jnp.int32(it))
            print(live_frame(np.asarray(accum), it, res_y, res_x,
                             cols=cols, first=first), end="", flush=True)
            first = False
            if max_iters and it >= max_iters:
                save_fn(np.asarray(accum) / it, it)
                return accum, it
            k = _read_key(0.0 if is_tty else 0.001)
            if not k:
                continue
            camera2, config2, reset, recompile, action = apply_key(
                k, camera, config)
            if action == "quit":
                save_fn(np.asarray(accum) / it, it)
                return accum, it
            if action == "save":
                save_fn(np.asarray(accum) / it, it)
                continue
            camera, config = camera2, config2
            if recompile or reset:
                if recompile or camera is not scene.camera:
                    step = make_render_fn(replace_camera(scene, camera),
                                          config)
            if reset:
                accum = jnp.zeros((n, 3), jnp.float32)
                it = 0
                first = True
            if action:
                print(f"\n[{action}]", flush=True)
    finally:
        if old_attrs is not None:
            termios.tcsetattr(sys.stdin, termios.TCSADRAIN, old_attrs)

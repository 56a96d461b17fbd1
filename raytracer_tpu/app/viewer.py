"""Interactive terminal viewer: the reference main loop, headless.

Rebuild of the reference's SDL window + event loop (main.cpp:144-397):
frames render continuously, WASD/arrow keys move the camera
(main.cpp:253-307), ``,``/``.`` yaw and ``[``/``]`` pitch (the reference's
rotate_left_right/rotate_up_down, scene.cpp:137-165 — implemented there but
left unbound, main.cpp:319-323), ``q`` quits (main.cpp:296-298), and
per-phase timing averages print on exit (main.cpp:384-392, via the native
timing registry).
Presentation is ANSI truecolor in the terminal (io/term.py) since TPU hosts
have no display.
"""

from __future__ import annotations

import select
import sys
import time

import numpy as np

from raytracer_tpu.app.config import RenderConfig
from raytracer_tpu.io import term_frame
from raytracer_tpu.ops.camera_ops import apply_action, rotate_left_right, rotate_up_down

__all__ = ["run_viewer"]

_KEY_ACTIONS = {
    "w": "forward", "s": "backward", "a": "left", "d": "right",
    # arrow keys arrive as ESC [ A/B/C/D; mapped in _read_key
    "UP": "forward", "DOWN": "backward", "LEFT": "left", "RIGHT": "right",
}


def _read_key(timeout: float) -> str | None:
    """One key from stdin (raw mode), decoding arrow escapes; None on idle."""
    r, _, _ = select.select([sys.stdin], [], [], timeout)
    if not r:
        return None
    ch = sys.stdin.read(1)
    if ch == "\x1b":
        seq = sys.stdin.read(2) if select.select([sys.stdin], [], [], 0.01)[0] else ""
        return {"[A": "UP", "[B": "DOWN", "[C": "RIGHT", "[D": "LEFT"}.get(seq)
    return ch


def test_pattern_frame(width: int, height: int) -> np.ndarray:
    """The reference's ``TEXTURE_TEST`` debug gradient (main.cpp:13,212-221):
    red fixed at 1, green ramps with x / width, blue with y / height."""
    x = np.linspace(0.0, 1.0, width, endpoint=False, dtype=np.float32)
    y = np.linspace(0.0, 1.0, height, endpoint=False, dtype=np.float32)
    img = np.empty((height, width, 3), np.float32)
    img[..., 0] = 1.0
    img[..., 1] = x[None, :]
    img[..., 2] = y[:, None]
    return img


def run_viewer(cfg: RenderConfig, *, max_cols: int = 100, max_frames: int = 0,
               log_path=None, test_pattern: bool = False) -> int:
    import jax

    from raytracer_tpu.io.native import load_native
    from raytracer_tpu.render.integrator import render

    scene = cfg.build_scene()
    camera = cfg.build_camera()
    camera0 = camera  # for the `r` reset binding (main.cpp:286-288)

    lib = load_native()
    timer = lib.rt_timer_new() if lib else None

    def timed(name: str):
        class _P:
            def __enter__(self):
                if timer:
                    lib.rt_timer_phase_begin(timer, name.encode())

            def __exit__(self, *a):
                if timer:
                    lib.rt_timer_phase_end(timer, name.encode())

        return _P()

    render_fn = jax.jit(
        lambda s, c: render(
            s, c, cfg.width, cfg.height,
            depth=cfg.depth, tonemap=cfg.tonemap, fold=cfg.fold,
        )
    )

    interactive = sys.stdin.isatty() and max_frames == 0
    raw_ctx = None
    if interactive:
        import termios
        import tty

        fd = sys.stdin.fileno()
        raw_ctx = termios.tcgetattr(fd)
        tty.setcbreak(fd)

    frames = 0
    print("\x1b[2J", end="")  # clear
    try:
        while True:
            with timed("raytracing"):
                if test_pattern:  # TEXTURE_TEST mode (main.cpp:13,212-221)
                    img = test_pattern_frame(cfg.width, cfg.height)
                else:
                    img = np.asarray(render_fn(scene, camera))
            with timed("present"):
                frame = term_frame(img, max_width=max_cols)
                sys.stdout.write("\x1b[H" + frame)
                sys.stdout.flush()
            frames += 1
            if max_frames and frames >= max_frames:
                break
            if not interactive:
                continue  # no stdin to poll (CI / piped runs)
            key = _read_key(0.01)
            if key == "q":  # main.cpp:296-298
                break
            if key == "r":  # camera reset (main.cpp:286-288 binds `r`;
                camera = camera0  # its body is commented out — ours works)
            elif key in _KEY_ACTIONS:
                camera = apply_action(camera, _KEY_ACTIONS[key])
            elif key == ",":
                camera = rotate_left_right(camera, 0.1)
            elif key == ".":
                camera = rotate_left_right(camera, -0.1)
            elif key == "[":  # pitch (reference: rotate_up_down,
                camera = rotate_up_down(camera, 0.1)  # scene.cpp:147-165 —
            elif key == "]":  # implemented there but its call sites are
                camera = rotate_up_down(camera, -0.1)  # commented out)
    except KeyboardInterrupt:
        pass
    finally:
        if raw_ctx is not None:
            import termios

            termios.tcsetattr(sys.stdin.fileno(), termios.TCSADRAIN, raw_ctx)
        if timer:
            import ctypes

            buf = ctypes.create_string_buffer(1 << 14)
            lib.rt_timer_report(timer, buf, 1 << 14)
            report = buf.value.decode().strip()
            print("\n" + report)  # main.cpp:384-392
            if log_path:  # the .log files the reference README claims
                with open(log_path, "w") as fh:
                    fh.write(report + "\n")
            lib.rt_timer_free(timer)
    return 0

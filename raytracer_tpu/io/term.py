"""Terminal frame presentation (the SDL-window replacement).

Renders frames as ANSI truecolor half-blocks via the native presenter
(native/src/term_view.cpp) — the interactive-preview path for headless TPU
hosts, doubling as the Sprint-1 "ASCII art" mode the reference README
describes (README.md:28-37). Pure-Python fallback included.
"""

from __future__ import annotations

import ctypes

import numpy as np

from raytracer_tpu.io.images import to_u8
from raytracer_tpu.io.native import load_native

__all__ = ["term_frame"]


def term_frame(img, max_width: int = 120) -> str:
    """ANSI string showing the image at up to ``max_width`` columns."""
    a = to_u8(img)
    h, w = a.shape[:2]
    if w > max_width:  # cheap nearest-neighbor downscale for terminals
        step = -(-w // max_width)
        a = np.ascontiguousarray(a[::step, ::step])
        h, w = a.shape[:2]

    lib = load_native()
    if lib is not None:
        cap = lib.rt_term_frame_size(w, h)
        buf = ctypes.create_string_buffer(cap)
        n = lib.rt_term_frame(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, buf, cap
        )
        if n > 0:
            return buf.value.decode()

    # Fallback: same half-block format in Python.
    lines = []
    for y in range(0, h, 2):
        row = []
        for x in range(w):
            t = a[y, x]
            if y + 1 < h:
                b = a[y + 1, x]
                row.append(
                    f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                    f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
                )
            else:
                row.append(f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[49m▀")
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines) + "\n"

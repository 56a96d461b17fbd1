"""Image export: PNG/PPM (native C++ encoder) and raw npy.

The reference never persists a frame — pixels only ever reach the SDL
window (SURVEY.md §5, checkpoint/resume: "not even image export"). Export
is the headless-TPU replacement for that window: tone-mapped [H, W, 3]
floats are quantized on device (ops/tonemap.py, the clamped version of the
reference's ``SDL_MapRGB(val*255)`` cast, main.cpp:345) and encoded by the
native library (native/src/image_io.cpp); PIL is the pure-Python fallback.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from raytracer_tpu.io.native import load_native

__all__ = ["save_image", "save_png", "save_ppm", "save_npy", "load_image", "to_u8"]


def to_u8(img) -> np.ndarray:
    """[H, W, 3] float [0,1] -> contiguous u8 (device-side path: tonemap.to_uint8)."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    return np.ascontiguousarray(a)


def _u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def save_png(path, img) -> Path:
    path = Path(path)
    a = to_u8(img)
    h, w = a.shape[:2]
    lib = load_native()
    if lib is not None:
        rc = lib.rt_write_png(str(path).encode(), _u8_ptr(a), w, h)
        if rc == 0:
            return path
    from PIL import Image  # fallback

    Image.fromarray(a).save(path)
    return path


def save_ppm(path, img) -> Path:
    path = Path(path)
    a = to_u8(img)
    h, w = a.shape[:2]
    lib = load_native()
    if lib is not None and lib.rt_write_ppm(str(path).encode(), _u8_ptr(a), w, h) == 0:
        return path
    with open(path, "wb") as f:  # trivial fallback
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(a.tobytes())
    return path


def save_npy(path, img) -> Path:
    """Raw (pre-quantization) radiance dump for exact comparisons."""
    path = Path(path)
    np.save(path, np.asarray(img))
    return path


def load_image(path) -> np.ndarray:
    """Load a .ppm (binary P6, no deps) or .png (PIL) as [H, W, 3] uint8.

    Used by the golden-image comparison against the reference tracer's own
    framebuffer (tools/ref_harness/, tests/test_golden_reference.py).
    """
    path = Path(path)
    if path.suffix.lower() == ".ppm":
        with open(path, "rb") as f:
            data = f.read()
        # P6 header: magic, width, height, maxval — whitespace/comment tolerant.
        tokens, pos = [], 0
        while len(tokens) < 4:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                pos = data.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(data[start:pos])
        if tokens[0] != b"P6" or int(tokens[3]) != 255:
            raise ValueError(f"unsupported PPM: {tokens}")
        w, h = int(tokens[1]), int(tokens[2])
        pix = np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos + 1)
        return pix.reshape(h, w, 3).copy()
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def save_image(path, img) -> Path:
    """Save by extension: .png, .ppm, or .npy."""
    path = Path(path)
    ext = path.suffix.lower()
    if ext == ".png":
        return save_png(path, img)
    if ext == ".ppm":
        return save_ppm(path, img)
    if ext == ".npy":
        return save_npy(path, img)
    raise ValueError(f"unsupported image extension: {ext!r}")

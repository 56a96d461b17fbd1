"""ctypes loader/builder for the native runtime library (native/).

The reference's runtime is C++ (SURVEY.md layer map); the rebuild keeps the
runtime-side pieces native too: PNG/PPM encoding, the terminal presenter,
and the phase-timing registry live in ``native/src/*.cpp``, compiled to
``librt_native.so`` and loaded here. Build happens on demand (cmake if
available, direct g++ otherwise); every caller has a pure-Python fallback,
so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path

__all__ = ["load_native", "native_available", "build_native"]

_REPO = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_LIB = _BUILD_DIR / "librt_native.so"

_lib: ctypes.CDLL | None = None
_tried = False


def build_native(force: bool = False) -> Path | None:
    """Compile native/ -> librt_native.so; returns the path or None.

    Rebuilds whenever any source file is newer than the library, so edits to
    ``native/src/*.cpp`` are never silently ignored by a stale binary.
    """
    src_paths = sorted((_NATIVE_DIR / "src").glob("*.cpp"))
    if _LIB.exists() and not force:
        lib_mtime = _LIB.stat().st_mtime
        if all(p.stat().st_mtime <= lib_mtime for p in src_paths):
            return _LIB
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    srcs = [str(p) for p in src_paths]
    # Compile to a per-process temp name, then atomically rename: concurrent
    # builders (e.g. pytest-xdist workers) must never dlopen a half-written
    # .so. rename() is atomic within a filesystem; last writer wins and
    # every winner is a complete library.
    tmp = _LIB.with_suffix(f".so.tmp{os.getpid()}")
    cmd = [
        "g++", "-std=c++17", "-O3", "-g", "-fPIC", "-shared", "-Wall",
        *srcs, "-lz", "-o", str(tmp),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
    except Exception as e:  # toolchain missing / compile error: fall back
        print(f"[raytracer_tpu.io] native build failed: {e}", file=sys.stderr)
        tmp.unlink(missing_ok=True)
        return None
    return _LIB


def load_native() -> ctypes.CDLL | None:
    """The loaded native library, building it on first use (or None)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_native()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError as e:
        print(f"[raytracer_tpu.io] native load failed: {e}", file=sys.stderr)
        return None

    lib.rt_write_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int
    ]
    lib.rt_write_png.restype = ctypes.c_int
    lib.rt_write_ppm.argtypes = lib.rt_write_png.argtypes
    lib.rt_write_ppm.restype = ctypes.c_int
    lib.rt_term_frame_size.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.rt_term_frame_size.restype = ctypes.c_long
    lib.rt_term_frame.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.rt_term_frame.restype = ctypes.c_long
    lib.rt_timer_new.restype = ctypes.c_void_p
    lib.rt_timer_free.argtypes = [ctypes.c_void_p]
    lib.rt_timer_phase_begin.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rt_timer_phase_end.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rt_timer_record.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_double
    ]
    lib.rt_timer_avg.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rt_timer_avg.restype = ctypes.c_double
    lib.rt_timer_report.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long
    ]
    lib.rt_timer_report.restype = ctypes.c_long
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_native() is not None

"""Image export and terminal presentation (native-backed)."""

from raytracer_tpu.io.images import save_image, save_npy, save_png, save_ppm
from raytracer_tpu.io.native import load_native, native_available
from raytracer_tpu.io.term import term_frame

__all__ = [
    "save_image",
    "save_png",
    "save_ppm",
    "save_npy",
    "term_frame",
    "load_native",
    "native_available",
]

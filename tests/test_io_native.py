"""Native runtime library (native/): image encoding, terminal frames,
timing registry — plus pytree checkpointing."""

import ctypes

import numpy as np
import pytest

from raytracer_tpu.io import native_available, save_png, save_ppm, term_frame
from raytracer_tpu.io.images import to_u8
from raytracer_tpu.io.native import load_native


def _test_image():
    img = np.zeros((40, 64, 3), np.float32)
    img[10:30, 16:48] = [0.2, 0.8, 0.3]
    img[:, :, 2] += np.linspace(0, 1, 64)[None, :]
    return img


def test_native_builds():
    assert native_available(), "native toolchain present in this image"


def test_png_roundtrip(tmp_path):
    img = _test_image()
    p = save_png(tmp_path / "t.png", img)
    from PIL import Image

    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, to_u8(img))


def test_ppm_roundtrip(tmp_path):
    img = _test_image()
    p = save_ppm(tmp_path / "t.ppm", img)
    raw = p.read_bytes()
    assert raw.startswith(b"P6\n64 40\n255\n")
    data = np.frombuffer(raw.split(b"255\n", 1)[1], np.uint8).reshape(40, 64, 3)
    np.testing.assert_array_equal(data, to_u8(img))


def test_term_frame_contains_ansi():
    s = term_frame(_test_image(), max_width=32)
    assert "\x1b[38;2;" in s and s.count("\n") >= 9


def test_native_timer_report():
    lib = load_native()
    if lib is None:
        pytest.skip("native lib unavailable")
    h = lib.rt_timer_new()
    lib.rt_timer_record(h, b"raytracing", 0.001)
    lib.rt_timer_record(h, b"raytracing", 0.003)
    assert abs(lib.rt_timer_avg(h, b"raytracing") - 0.002) < 1e-9
    buf = ctypes.create_string_buffer(1024)
    n = lib.rt_timer_report(h, buf, 1024)
    assert n > 0 and b"average raytracing time" in buf.value
    lib.rt_timer_free(h)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from raytracer_tpu.utils.checkpoint import load_pytree, save_pytree

    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}, "n": jnp.int32(7)}
    save_pytree(tmp_path / "ck.npz", tree)
    back = load_pytree(tmp_path / "ck.npz", tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.ones((2, 3)))
    assert int(back["n"]) == 7
    # structure mismatch fails loudly
    with pytest.raises(ValueError):
        load_pytree(tmp_path / "ck.npz", {"x": jnp.zeros(5)})

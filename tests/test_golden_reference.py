"""Golden-image comparison against the REFERENCE TRACER'S OWN framebuffer.

Every other correctness check in this suite flows through the builder-authored
NumPy oracle. This one doesn't: tests/golden/ref_demo_640x640_d10.png is the
true 640x640 framebuffer of the reference C++ tracer (/root/reference,
main.cpp demo scene, depth 10 — 640x640 because ASPECT_RATIO=4/3 is integer
division, main.cpp:25), captured by compiling it unmodified against the
headless SDL2 stub in tools/ref_harness/ and dumping the surface on the first
SDL_RenderPresent.

The comparison is structural, not bit-exact, because the build deliberately
normalizes reference quirks (SURVEY.md §7 quirk policy):
  - real pi vs 3.14 (scene.cpp:84) — FOV differs by ~0.05%;
  - unit ray directions vs the reference's unnormalized directions, whose
    |d| in [1, sqrt(3)] skews its sphere hit positions (scene.cpp:77 returns
    Euclidean distance, main.cpp:99 treats it as parametric) and thus its
    sphere shading;
  - float RGB pipeline in f32 vs the reference's f64.
The direction-flip quirk (main.cpp:133) IS replicated, so both images have
the same (mirrored) layout and compare pixel-for-pixel.
"""

from pathlib import Path

import numpy as np
import pytest

from raytracer_tpu.io.images import load_image, to_u8
from raytracer_tpu.models.scenes import reference_demo_camera, reference_demo_scene
from raytracer_tpu.render.integrator import render

GOLDEN = Path(__file__).parent / "golden" / "ref_demo_640x640_d10.png"


@pytest.fixture(scope="module")
def images():
    golden = load_image(GOLDEN).astype(np.float32) / 255.0
    scene = reference_demo_scene()
    cam = reference_demo_camera()
    # Reference has no tone map — SDL_MapRGB(val*255) straight cast
    # (main.cpp:345); its demo frame never exceeds 1.0 (golden max = 226).
    ours = render(scene, cam, 640, 640, depth=10, tonemap=False)
    ours = to_u8(ours).astype(np.float32) / 255.0
    return golden, ours


def _box_down(img: np.ndarray, k: int) -> np.ndarray:
    h, w, c = img.shape
    return img.reshape(h // k, k, w // k, k, c).mean(axis=(1, 3))


def test_golden_shape(images):
    golden, ours = images
    assert golden.shape == ours.shape == (640, 640, 3)


def test_golden_structural_allclose(images):
    """8x box-filtered images agree closely; disagreement is confined to
    silhouette edges and the quirk-policy sphere-shading deviation.

    Bars = measured deviation x 1.25 (VERDICT r4 item 8), measured
    2026-08-20 on the stable engines: mean 0.0017, p99 0.0039 — the old
    round-number bars (0.02 / 0.15) had 12-38x slack, room for a real
    regression to hide."""
    golden, ours = images
    g8, o8 = _box_down(golden, 8), _box_down(ours, 8)
    diff = np.abs(g8 - o8)
    assert diff.mean() < 0.0022, f"mean abs diff {diff.mean():.5f}"
    # 99th percentile bounds localized deviation (edges, sphere shading).
    assert np.quantile(diff, 0.99) < 0.0049, (
        f"p99 {np.quantile(diff, 0.99):.5f}"
    )


def test_golden_full_res_agreement(images):
    """At full resolution the overwhelming majority of pixels match tightly.

    Bar from the 2026-08-20 measurement (0.99952 of pixels within 0.04;
    allowed miss fraction x 1.25)."""
    golden, ours = images
    per_px = np.abs(golden - ours).max(axis=-1)
    frac_tight = (per_px < 0.04).mean()
    assert frac_tight > 0.9994, f"only {frac_tight:.5f} of pixels within 0.04"


def test_golden_regions(images):
    """Region semantics: layout + dominant colors match the reference render
    (which is mirrored vs physical layout — direction-flip quirk)."""
    for img in images:
        sky = img[40:120, 240:400].mean(axis=(0, 1))
        assert sky[2] > sky[0] and sky[2] > sky[1] and sky[2] > 0.3  # blue sky
        ground = img[500:600, 240:400].mean(axis=(0, 1))
        assert ground.max() < 0.1  # near-black ground
        left_wall = img[150:280, 20:110].mean(axis=(0, 1))
        assert left_wall[1] > left_wall[2] > left_wall[0]  # green wall left
        right_wall = img[220:300, 560:630].mean(axis=(0, 1))
        assert right_wall[2] > right_wall[1] > right_wall[0]  # blue wall right
        sphere = img[260:340, 280:360].mean(axis=(0, 1))
        assert sphere[1] > 0.35 and sphere[1] > 2.0 * sphere[0]  # green sphere

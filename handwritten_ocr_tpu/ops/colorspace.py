"""RGB <-> CIELAB (8-bit) with OpenCV semantics.

cv2 5.x's 8U Lab conversion (used inside fastNlMeansDenoisingColored,
ref tools.py:584) applies the sRGB gamma decompanding before the XYZ
matrix (probe-verified on this host: max error <= 1.9 levels vs
cv2.cvtColor over 10k random colors; the residue is cv2's fixed-point
LUT rounding). 8-bit scaling: L *= 255/100, a/b += 128.
"""

from __future__ import annotations

import jax.numpy as jnp

_XYZ = jnp.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]], jnp.float32)
_XYZ_INV = jnp.array([[3.240479, -1.537150, -0.498535],
                      [-0.969256, 1.875992, 0.041556],
                      [0.055648, -0.204043, 1.057311]], jnp.float32)
_WHITE = jnp.array([0.950456, 1.0, 1.088754], jnp.float32)
_EPS = 0.008856


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * c ** (1 / 2.4) - 0.055)


def rgb_to_lab(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W, 3] RGB -> float32 [H, W, 3] Lab in 8-bit scale."""
    linear = _srgb_to_linear(rgb_u8.astype(jnp.float32) / 255.0)
    xyz = linear @ _XYZ.T / _WHITE
    f = jnp.where(xyz > _EPS, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    y = xyz[..., 1]
    lum = jnp.where(y > _EPS, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (f[..., 0] - f[..., 1]) + 128.0
    b = 200.0 * (f[..., 1] - f[..., 2]) + 128.0
    return jnp.stack([lum * 255.0 / 100.0, a, b], axis=-1)


def lab_to_rgb(lab: jnp.ndarray) -> jnp.ndarray:
    """float32 [H, W, 3] Lab (8-bit scale) -> uint8 [H, W, 3] RGB."""
    lum = lab[..., 0] * 100.0 / 255.0
    fy = (lum + 16.0) / 116.0
    fx = fy + (lab[..., 1] - 128.0) / 500.0
    fz = fy - (lab[..., 2] - 128.0) / 200.0

    def inv_f(f):
        cube = f ** 3
        return jnp.where(cube > _EPS, cube, (f - 16.0 / 116.0) / 7.787)

    y = jnp.where(lum > 903.3 * _EPS, fy ** 3, lum / 903.3)
    xyz = jnp.stack([inv_f(fx), y, inv_f(fz)], axis=-1) * _WHITE
    linear = xyz @ _XYZ_INV.T
    srgb = _linear_to_srgb(linear) * 255.0
    return jnp.clip(jnp.rint(srgb), 0, 255).astype(jnp.uint8)

"""cv2's 8-bit linear-BGR <-> CIELAB conversions (LBGR2Lab / Lab2LBGR).

``cv2.fastNlMeansDenoisingColored`` (reference tools.py:584) detours
through CIELAB using the LINEAR variant ``COLOR_LBGR2Lab`` — no sRGB
gamma decompanding (OpenCV denoising.cpp). Probe results on this host:

- Forward (:func:`linear_bgr_to_lab_u8`) is a port of OpenCV's
  fixed-point ``RGB2Lab_b`` path: 12-bit whitepoint-scaled XYZ
  coefficients, a 3072-entry cube-root table built in float32, and
  round-half-up descales. **Bit-exact vs cv2.cvtColor over all 16.7M
  inputs.**
- Backward (:func:`lab_u8_to_linear_bgr`) is the float path
  (``Lab2RGBfloat`` semantics). cv2's own 8U inverse runs through its
  softfloat interpolation tables, so this differs by **at most one gray
  level** (57% exact over all 16.7M inputs) — inside the band that the
  transform-CER A/B controls showed to be transcription-invisible.

Channel order note: index 0 plays cv2's "B" role. The reference passes a
PIL-derived RGB array straight into the BGR-assuming cv2 API
(tools.py:582-584); callers here do the same, which reproduces the
reference's behavior exactly, channel-order quirk included.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_LAB_SHIFT = 12          # xyz matrix fixed-point bits (OpenCV lab_shift)
_GAMMA_SHIFT = 3         # channel pre-scale bits (linear "gamma" table)
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT

# sRGB -> XYZ (D65) and inverse, OpenCV constants.
_XYZ = np.array([[0.412453, 0.357580, 0.180423],
                 [0.212671, 0.715160, 0.072169],
                 [0.019334, 0.119193, 0.950227]])
_XYZ_INV = np.array([[3.240479, -1.537150, -0.498535],
                     [-0.969256, 1.875992, 0.041556],
                     [0.055648, -0.204043, 1.057311]])
_WHITE = np.array([0.950456, 1.0, 1.088754])

# Whitepoint-scaled integer coefficients, rows X/Y/Z by columns R/G/B.
_COEFFS = np.round(_XYZ / _WHITE[:, None] * (1 << _LAB_SHIFT)).astype(np.int32)


def _build_cbrt_tab() -> np.ndarray:
    """OpenCV's LabCbrtTab_b, reproduced in float32 (bit-exactness of the
    forward conversion depends on f32 here, verified by full-cube probe)."""
    scale = np.float32(1.0) / np.float32(1 << _GAMMA_SHIFT)
    i = np.arange(3072, dtype=np.float32)
    x = (i * scale / np.float32(255)).astype(np.float32)
    small = x * np.float32(7.787) + np.float32(0.13793103448275862)
    big = np.cbrt(x).astype(np.float32)
    value = np.where(x < np.float32(0.008856), small, big).astype(np.float32)
    return np.round((np.float32(1 << _LAB_SHIFT2) * value)
                    .astype(np.float64)).astype(np.int32)


_CBRT_TAB = _build_cbrt_tab()
_L_SCALE = (116 * 255 + 50) // 100
_L_SHIFT = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)


def _descale(value: jnp.ndarray, bits: int) -> jnp.ndarray:
    return (value + (1 << (bits - 1))) >> bits


def linear_bgr_to_lab_u8(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W, 3] (channel 0 = cv2's "B") -> uint8 [H, W, 3] Lab.

    Bit-exact port of cv2.cvtColor(..., COLOR_LBGR2Lab) for 8U."""
    tab = jnp.asarray(_CBRT_TAB)
    c = _COEFFS
    b = img_u8[..., 0].astype(jnp.int32) << _GAMMA_SHIFT
    g = img_u8[..., 1].astype(jnp.int32) << _GAMMA_SHIFT
    r = img_u8[..., 2].astype(jnp.int32) << _GAMMA_SHIFT
    fx = tab[jnp.clip(_descale(r * int(c[0, 0]) + g * int(c[0, 1])
                               + b * int(c[0, 2]), _LAB_SHIFT), 0, 3071)]
    fy = tab[jnp.clip(_descale(r * int(c[1, 0]) + g * int(c[1, 1])
                               + b * int(c[1, 2]), _LAB_SHIFT), 0, 3071)]
    fz = tab[jnp.clip(_descale(r * int(c[2, 0]) + g * int(c[2, 1])
                               + b * int(c[2, 2]), _LAB_SHIFT), 0, 3071)]
    lum = _descale(_L_SCALE * fy + _L_SHIFT, _LAB_SHIFT2)
    a = _descale(500 * (fx - fy) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    bb = _descale(200 * (fy - fz) + (128 << _LAB_SHIFT2), _LAB_SHIFT2)
    out = jnp.stack([lum, a, bb], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def lab_u8_to_linear_bgr(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W, 3] Lab -> uint8 [H, W, 3] linear BGR-ordered RGBish.

    Float Lab2RGBfloat semantics (no gamma recompanding, LBGR variant);
    <= 1 level vs cv2's table-interpolated 8U path everywhere."""
    f32 = jnp.float32
    lum = lab_u8[..., 0].astype(f32) * f32(100.0 / 255.0)
    a = lab_u8[..., 1].astype(f32) - f32(128.0)
    b = lab_u8[..., 2].astype(f32) - f32(128.0)
    l_thresh = f32(0.008856) * f32(903.3)
    f_thresh = f32(7.787) * f32(0.008856) + f32(16.0 / 116.0)
    low = lum <= l_thresh
    y = jnp.where(low, lum / f32(903.3),
                  ((lum + f32(16.0)) / f32(116.0)) ** 3)
    fy = jnp.where(low, f32(7.787) * (lum / f32(903.3)) + f32(16.0 / 116.0),
                   (lum + f32(16.0)) / f32(116.0))
    fx = fy + a / f32(500.0)
    fz = fy - b / f32(200.0)

    def inv(fv):
        return jnp.where(fv <= f_thresh,
                         (fv - f32(16.0 / 116.0)) / f32(7.787), fv ** 3)

    x, z = inv(fx), inv(fz)
    coeffs = _XYZ_INV * _WHITE[None, :]          # whitepoint folded in
    red = (x * f32(coeffs[0, 0]) + y * f32(coeffs[0, 1])
           + z * f32(coeffs[0, 2]))
    green = (x * f32(coeffs[1, 0]) + y * f32(coeffs[1, 1])
             + z * f32(coeffs[1, 2]))
    blue = (x * f32(coeffs[2, 0]) + y * f32(coeffs[2, 1])
            + z * f32(coeffs[2, 2]))
    out = jnp.stack([blue, green, red], axis=-1) * f32(255.0)
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
